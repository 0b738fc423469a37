"""Sharded tile-pruned index on the 8-device simulated mesh (config #4 fast
path): full-coverage recall ≈ int8 ceiling; ids valid across shards."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.parallel.dist_band import ShardedBandIndex
from cloudvectordb_tpu.parallel.mesh import make_mesh


def test_sharded_band_recall_and_ids():
    db = clustered_vectors(4096, 64, n_clusters=32, seed=180, normalize=True)
    q = queries_from(db, 32, seed=181, normalize=True)
    _, gt = brute_force_topk(db, q, 10, metric="ip")
    mesh = make_mesh(axis_name="shard")
    idx = ShardedBandIndex.build(
        db, nlist=16, mesh=mesh, dtype="int8", kmeans_iters=6,
        tile_n=128, tile_q=16, seed=5,
    )
    assert idx.ntotal == 4096
    st = idx._device_state()
    _, found = idx.search(q, 10, p_tiles=st["n_tiles"])  # full coverage
    r = recall_at_k(found, gt)
    assert r >= 0.85, r  # int8 ceiling on this data
    assert found.min() >= 0 and found.max() < 4096
    # every shard's partition contributes: ids span all 8 row ranges
    owners = set((found // (4096 // 8)).flatten().tolist())
    assert len(owners) >= 6
    # pruned coverage still recalls
    _, found_p = idx.search(q, 10, nprobe=8)
    assert recall_at_k(found_p, gt) >= r - 0.15
