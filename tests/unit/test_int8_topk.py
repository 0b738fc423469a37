"""int8 fused scan vs f32 oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas_int8


def test_int8_scan_high_recall_and_scores():
    db = clustered_vectors(3000, 48, seed=70, normalize=True)
    q = queries_from(db, 16, seed=71, normalize=True)
    scale = float(np.abs(db).max() / 127.0)
    db_i8 = np.clip(np.round(db / scale), -127, 127).astype(np.int8)
    s, i = flat_topk_pallas_int8(
        jnp.asarray(db_i8), scale, jnp.asarray(q), 10,
        tile_n=512, tile_q=32, l_buckets=512, interpret=True,
    )
    s_true, i_true = brute_force_topk(db, q, 10, metric="ip")
    assert recall_at_k(np.asarray(i), i_true) >= 0.85
    # dequantized scores approximate true IPs
    np.testing.assert_allclose(np.asarray(s)[:, 0], s_true[:, 0], rtol=0.05, atol=0.05)
