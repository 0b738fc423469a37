"""Sharded IVF-PQ on the simulated 8-device mesh: recall parity with the
single-device index (same quantizers, same nprobe semantics per shard)."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.index import IVFPQIndex
from cloudvectordb_tpu.parallel.dist_ivf import ShardedIVFPQIndex
from cloudvectordb_tpu.parallel.mesh import make_mesh


def test_sharded_ivfpq_recall_parity():
    db = clustered_vectors(4000, 32, n_clusters=24, seed=60)
    q = queries_from(db, 16, seed=61)
    _, gt = brute_force_topk(db, q, 10, metric="ip")
    mesh = make_mesh(axis_name="shard")
    kw = dict(nbits=6, metric="ip", kmeans_iters=6, pq_train_iters=6, seed=3)
    sharded = ShardedIVFPQIndex.build(db, nlist=16, m=8, mesh=mesh, **kw)
    assert sharded.ntotal == 4000
    _, i_sh = sharded.search(q, 10, nprobe=16)
    r_sh = recall_at_k(i_sh, gt)
    single = IVFPQIndex.build(db, nlist=16, m=8, **kw)
    _, i_si = single.search(q, 10, nprobe=16)
    r_si = recall_at_k(i_si, gt)
    # same quantizer family; sharded may differ slightly (per-shard k-means
    # sample) but must stay within noise of the single-device recall
    assert r_sh >= r_si - 0.05, (r_sh, r_si)
    assert r_sh >= 0.55


def test_sharded_ivfpq_incremental_add():
    db = clustered_vectors(2400, 16, seed=62)
    q = queries_from(db, 8, seed=63)
    mesh = make_mesh(axis_name="shard")
    idx = ShardedIVFPQIndex.build(
        db[:1600], nlist=8, m=4, mesh=mesh, nbits=6, metric="ip",
        kmeans_iters=5, pq_train_iters=5,
    )
    idx.add(db[1600:])
    assert idx.ntotal == 2400
    _, ids = idx.search(q, 10, nprobe=8)
    assert ids.max() < 2400 and ids.min() >= 0
    # late-added rows must be findable: query near an added vector
    q_late = db[2000:2008]
    _, ids_late = idx.search(q_late, 1, nprobe=8)
    _, gt_late = brute_force_topk(db, q_late, 1, metric="ip")
    assert recall_at_k(ids_late, gt_late) >= 0.5


def test_sharded_ivfpq_refine_improves_recall():
    db = clustered_vectors(4000, 32, n_clusters=24, seed=64, normalize=True)
    q = queries_from(db, 16, seed=65, normalize=True)
    _, gt = brute_force_topk(db, q, 10, metric="ip")
    mesh = make_mesh(axis_name="shard")
    kw = dict(nbits=6, metric="ip", kmeans_iters=6, pq_train_iters=6, seed=3)
    plain = ShardedIVFPQIndex.build(db, nlist=16, m=8, mesh=mesh, **kw)
    refined = ShardedIVFPQIndex.build(db, nlist=16, m=8, mesh=mesh,
                                      refine="int8", **kw)
    _, i_p = plain.search(q, 10, nprobe=16)
    _, i_r = refined.search(q, 10, nprobe=16)
    r_p = recall_at_k(i_p, gt)
    r_r = recall_at_k(i_r, gt)
    assert r_r >= max(r_p, 0.85), (r_p, r_r)


def test_sharded_ivfpq_add_with_refine():
    """r1 raised NotImplementedError here: adds must work with the int8
    refine stage (insertion-order row store re-staged in arena order)."""
    db = clustered_vectors(3200, 32, n_clusters=24, seed=66, normalize=True)
    q = queries_from(db, 16, seed=67, normalize=True)
    mesh = make_mesh(axis_name="shard")
    idx = ShardedIVFPQIndex.build(
        db[:2400], nlist=16, m=8, mesh=mesh, nbits=6, metric="ip",
        kmeans_iters=6, pq_train_iters=6, refine="int8", seed=3,
    )
    for s in range(2400, 3200, 200):
        idx.add(db[s : s + 200])
    assert idx.ntotal == 3200
    _, gt = brute_force_topk(db, q, 10, metric="ip")
    _, ids = idx.search(q, 10, nprobe=16)
    assert recall_at_k(ids, gt) >= 0.85
    # late-added rows are their own nearest neighbor under refine
    q_late = db[3000:3016]
    _, late = idx.search(q_late, 1, nprobe=16)
    assert (late[:, 0] == np.arange(3000, 3016)).mean() >= 0.85


def test_sharded_ivfpq_2d_replica_mesh_parity():
    """2×4 ('replica','shard') mesh must return exactly the 1-D 4-shard
    results — the replica axis only splits the query batch."""
    from cloudvectordb_tpu.parallel.mesh import make_2d_mesh, make_mesh

    db = clustered_vectors(4096, 64, n_clusters=32, seed=300, normalize=True)
    q = queries_from(db, 48, seed=301, normalize=True)
    kw = dict(nlist=16, m=8, nbits=5, kmeans_iters=6, pq_train_iters=5,
              refine="int8", seed=3)
    flat = ShardedIVFPQIndex.build(db, mesh=make_mesh(4, axis_name="shard"),
                                   **kw)
    twod = ShardedIVFPQIndex.build(db, mesh=make_2d_mesh(2, 4), **kw)
    v1, i1 = flat.search(q, 10, nprobe=16)
    v2, i2 = twod.search(q, 10, nprobe=16)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)


def test_sharded_ivfpq_range_search_past_shard_capacity():
    """range_search escalates k past any single shard's row count; the
    refine stage must rescore the k_cand that exists (capped at the largest
    shard) and pad the width back — k > per-shard ntotal used to crash
    lax.top_k inside _refine_rescore. Hits check against the numpy oracle."""
    db = clustered_vectors(2048, 32, n_clusters=16, seed=90, normalize=True)
    q = queries_from(db, 8, seed=91, normalize=True)
    mesh = make_mesh(axis_name="shard")  # 8 shards × 256 rows
    idx = ShardedIVFPQIndex.build(
        db, nlist=16, m=8, mesh=mesh, nbits=6, kmeans_iters=6,
        pq_train_iters=6, refine="int8", seed=3)
    radius = -1.0  # every row is a hit: escalation runs to k_max > 256
    lims, _, ids = idx.range_search(q, radius, k_start=32, k_max=2048,
                                    nprobe=16)
    assert (np.diff(lims) > 256).all()  # wider than any one shard
    for i in range(q.shape[0]):
        row = ids[lims[i]:lims[i + 1]]
        assert len(set(row.tolist())) == len(row)  # no duplicate ids
