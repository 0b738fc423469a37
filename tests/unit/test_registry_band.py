"""band_ivf through the config registry + save/load (CPU interpret path)."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.index import build_index, load_index
from cloudvectordb_tpu.ops import topk_ip, topk_l2, assign_centroids, adc_scan  # noqa: F401
from cloudvectordb_tpu.utils.config import IndexConfig


def test_band_via_registry_and_roundtrip(tmp_path):
    db = clustered_vectors(2048, 32, seed=120, normalize=True)
    q = queries_from(db, 16, seed=121, normalize=True)
    cfg = IndexConfig(kind="band_ivf", metric="ip", dim=32, nlist=16,
                      kmeans_iters=5, train_sample=2048)
    idx = build_index(db, cfg)
    idx.tile_q = 16  # tiny tiles for the CPU interpret path
    idx.tile_n = 512
    idx._populate(db)  # re-tile
    _, found = idx.search(q, 10, nprobe=16)
    _, gt = brute_force_topk(db, q, 10, metric="ip")
    assert recall_at_k(found, gt) >= 0.8
    idx.save(tmp_path / "b")
    idx2 = load_index(tmp_path / "b")
    assert idx2.ntotal == idx.ntotal
    _, found2 = idx2.search(q, 10, nprobe=16)
    np.testing.assert_array_equal(found, found2)
