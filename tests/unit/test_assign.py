"""ops.assign vs numpy nearest-centroid."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import clustered_vectors
from cloudvectordb_tpu.ops.assign import assign_clusters


def test_assign_matches_numpy():
    x = clustered_vectors(1000, 24, seed=12)
    c = clustered_vectors(16, 24, seed=13)
    a, d = assign_clusters(x, c, tile=256)
    dist = ((x[:, None, :].astype(np.float64) - c[None].astype(np.float64)) ** 2).sum(-1)
    # ties between equidistant centroids may break differently in f32; compare
    # the achieved distance, not the id.
    chosen = dist[np.arange(len(x)), np.asarray(a)]
    np.testing.assert_allclose(chosen, dist.min(1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), dist.min(1), rtol=1e-4, atol=1e-4)
