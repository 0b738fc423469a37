"""Deletion on the sharded wrappers (8-device simulated mesh): removes fan
out to the owning shards, the staged mesh state refreshes, and freed global
ids are never reused."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.parallel.dist_band import ShardedBandIndex
from cloudvectordb_tpu.parallel.dist_ivf import ShardedIVFPQIndex
from cloudvectordb_tpu.parallel.mesh import make_mesh


def _surviving_gt(db, q, removed, k=10):
    keep = np.ones(db.shape[0], bool)
    keep[removed] = False
    kept_ids = np.flatnonzero(keep)
    _, gt_pos = brute_force_topk(db[keep], q, k, metric="ip")
    return kept_ids[gt_pos]


def test_sharded_band_remove():
    db = clustered_vectors(4096, 64, n_clusters=32, seed=190, normalize=True)
    q = queries_from(db, 32, seed=191, normalize=True)
    mesh = make_mesh(axis_name="shard")
    idx = ShardedBandIndex.build(
        db, nlist=16, mesh=mesh, dtype="int8", residual=True, slack=0.2,
        kmeans_iters=6, tile_n=128, tile_q=16, seed=5,
    )
    st = idx._device_state()  # stage, so remove must invalidate it
    removed = np.arange(0, 4096, 7)  # ids land across all 8 shards
    assert idx.remove(removed) == removed.size
    assert idx.ntotal == 4096 - removed.size
    gt = _surviving_gt(db, q, removed)
    st = idx._device_state()
    _, found = idx.search(q, 10, p_tiles=st["n_tiles"])
    assert not np.isin(found, removed).any()
    assert recall_at_k(found, gt) >= 0.85
    # idempotent: the same request removes nothing more
    assert idx.remove(removed) == 0


def test_sharded_ivfpq_remove_then_add():
    db = clustered_vectors(4096, 64, n_clusters=32, seed=192, normalize=True)
    q = queries_from(db, 32, seed=193, normalize=True)
    mesh = make_mesh(axis_name="shard")
    idx = ShardedIVFPQIndex.build(
        db[:4000], nlist=16, mesh=mesh, m=8, kmeans_iters=4,
        pq_train_iters=4, refine="int8", seed=5,
    )
    removed = np.arange(0, 4000, 9)
    assert idx.remove(removed) == removed.size
    assert idx.ntotal == 4000 - removed.size
    idx.add(db[4000:4096])  # new ids continue past 4000 — never recycled
    assert idx._next_id == 4096
    gt = _surviving_gt(db[:4000], q, removed)
    _, found = idx.search(q, 10, nprobe=16, refine_factor=16)
    assert not np.isin(found, removed).any()
    # survivors keep their recall; the 96 added rows can only displace
    # true neighbors, so allow a small slack on the floor
    assert recall_at_k(found, gt) >= 0.85


def test_distributed_flat_remove():
    """r3 review follow-through: the 'every family' deletion contract
    includes the row-sharded exact index — device compaction + re-shard,
    original ids preserved through the materialized id map."""
    from cloudvectordb_tpu.parallel.dist_search import DistributedFlatIndex

    db = clustered_vectors(1024, 32, n_clusters=16, seed=194, normalize=True)
    q = queries_from(db, 16, seed=195, normalize=True)
    idx = DistributedFlatIndex.build(db, mesh=make_mesh(axis_name="shard"))
    removed = np.arange(0, 1024, 3)
    assert idx.remove(removed) == removed.size
    assert idx.ntotal == 1024 - removed.size
    gt = _surviving_gt(db, q, removed)
    _, found = idx.search(q, 10)
    assert not np.isin(found, removed).any()
    assert recall_at_k(found, gt) == 1.0  # exact index
    # unknown / repeated ids are ignored
    assert idx.remove(removed[:7]) == 0
    # post-remove adds never recycle freed ids and are searchable: row 3
    # was removed, so its re-added copy (new id) is the only exact match
    idx.add(db[:8])
    _, f2 = idx.search(db[3:4], 1)
    assert f2[0, 0] >= 1024
