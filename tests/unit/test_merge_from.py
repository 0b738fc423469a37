"""merge_from: consolidate independently-built same-quantizer indexes
(the FAISS merge_from surface) — band + probe-scan IVF-PQ families.

Oracle: an index built directly on the union of both partitions under the
same quantizer must agree with the merged index at full coverage.
"""

import numpy as np
import pytest

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.index.ivf_band import BandIVFIndex, BandIVFPQIndex
from cloudvectordb_tpu.index.ivf_pq import IVFPQIndex


@pytest.fixture(scope="module")
def split_data():
    db = clustered_vectors(3072, 64, n_clusters=24, seed=240, normalize=True)
    q = queries_from(db, 24, seed=241, normalize=True)
    _, gt = brute_force_topk(db, q, 10, metric="ip")
    return db, q, gt


def _band_pair(db, **kw):
    """Two band indexes over disjoint halves sharing one coarse quantizer
    (the merge_from contract: train once, reuse per worker)."""
    a = BandIVFIndex.build(db[:2048], nlist=16, **kw)
    b = BandIVFIndex(db.shape[1], 16, **kw)
    b.centroids = a.centroids
    b._populate(db[2048:])
    return a, b


def test_band_merge_from_matches_union_build(split_data):
    db, q, gt = split_data
    kw = dict(dtype="int8", residual=True, kmeans_iters=6, tile_n=128,
              tile_q=8, seed=9)
    a, b = _band_pair(db, **kw)
    assert a._scale != b._scale  # the requantize path is exercised
    n_in = a.merge_from(b, id_offset=2048)  # b's local ids 0.. → global
    assert n_in == 1024 and a.ntotal == 3072
    n_tiles = a._payload.shape[0] // a.tile_n
    _, found = a.search(q, 10, p_tiles=n_tiles, interpret=True)
    assert recall_at_k(found, gt) >= 0.9
    # merged rows are their own nearest neighbor (ids landed correctly)
    _, self_hit = a.search(db[2048:2072], 1, p_tiles=n_tiles, interpret=True)
    assert (self_hit[:, 0] == np.arange(2048, 2072)).mean() >= 0.9
    # further adds allocate PAST both id ranges
    bound = a._gid_bound()
    assert bound >= 3072
    a.add(db[:8])
    assert a._gid_bound() == bound + 8


def test_band_merge_from_rejects_colliding_ids(split_data):
    db, _, _ = split_data
    kw = dict(dtype="int8", residual=True, kmeans_iters=6, tile_n=128,
              tile_q=8, seed=9)
    a, b = _band_pair(db, **kw)
    with pytest.raises(AssertionError, match="colliding global ids"):
        a.merge_from(b)  # both allocated from 0


def test_band_merge_from_rejects_foreign_quantizer(split_data):
    db, _, _ = split_data
    kw = dict(dtype="int8", residual=True, kmeans_iters=6, tile_n=128,
              tile_q=8, seed=9)
    a = BandIVFIndex.build(db[:2048], nlist=16, **kw)
    c = BandIVFIndex.build(db[2048:], nlist=16, **dict(kw, seed=11))
    with pytest.raises(AssertionError):
        a.merge_from(c, id_offset=2048)


def test_ivfpq_merge_from_with_refine(split_data):
    db, q, gt = split_data
    kw = dict(nbits=6, kmeans_iters=6, pq_train_iters=6, seed=3,
              refine="int8")
    a = IVFPQIndex(db.shape[1], 16, m=8, **kw)
    a.train(db[:2048])
    a.add(db[:2048])
    b = IVFPQIndex(db.shape[1], 16, m=8, **kw)
    b.centroids, b.codebooks = a.centroids, a.codebooks
    b.add(db[2048:])
    n_in = a.merge_from(b, id_offset=2048)
    assert n_in == 1024 and a.ntotal == 3072
    _, found = a.search(q, 10, nprobe=16)
    assert recall_at_k(found, gt) >= 0.85
    # refine store survives under shifted gids: merged rows self-retrieve
    _, self_hit = a.search(db[2048:2072], 1, nprobe=16)
    assert (self_hit[:, 0] == np.arange(2048, 2072)).mean() >= 0.9
    # union build under the same quantizers agrees on recall
    u = IVFPQIndex(db.shape[1], 16, m=8, **kw)
    u.centroids, u.codebooks = a.centroids, a.codebooks
    u.add(db)
    _, fu = u.search(q, 10, nprobe=16)
    assert abs(recall_at_k(found, gt) - recall_at_k(fu, gt)) <= 0.02


def _bandpq_pair(db, **kw):
    """(a, b, clone): two PQ-tiles indexes over disjoint halves sharing
    one coarse quantizer + codebooks (+ tier-2), and a factory for more
    same-quantizer indexes (the union-build oracle)."""
    kw_full = dict(m=8, nbits=6, kmeans_iters=6, pq_train_iters=5,
                   tile_n=256, tile_q=8, seed=7, **kw)
    a = BandIVFPQIndex.build(db[:2048], nlist=16, **kw_full)

    def clone():
        c = BandIVFPQIndex(db.shape[1], 16, **kw_full)
        c.centroids, c.codebooks = a.centroids, a.codebooks
        c.codebooks2 = a.codebooks2
        return c

    b = clone()
    b._populate(db[2048:])
    return a, b, clone


def test_band_pq_merge_from_int8_refine(split_data):
    db, q, gt = split_data
    a, b, clone = _bandpq_pair(db, refine="int8")
    assert a._scale != b._scale  # requantize path exercised
    n_in = a.merge_from(b, id_offset=2048)
    assert n_in == 1024 and a.ntotal == 3072
    n_tiles = a._n_pad_rows // a.tile_n
    _, found = a.search(q, 10, p_tiles=n_tiles, interpret=True)
    r = recall_at_k(found, gt)
    assert r >= 0.8, r
    # union build under the same quantizers agrees
    u = clone()
    u._populate(db)
    _, fu = u.search(q, 10, p_tiles=u._n_pad_rows // u.tile_n,
                     interpret=True)
    assert abs(r - recall_at_k(fu, gt)) <= 0.03
    # merged rows self-retrieve under their shifted gids
    _, self_hit = a.search(db[2048:2072], 1, p_tiles=n_tiles,
                           interpret=True)
    assert (self_hit[:, 0] == np.arange(2048, 2072)).mean() >= 0.9


def test_band_pq_merge_from_pq2_l2(split_data):
    """pq2 tier (the 125M-scale refine) + metric='l2' (s₂ table): the
    gid-keyed tier-2 tables must land verbatim under the shifted ids."""
    db, q, gt = split_data  # normalized → l2 ranking == ip ranking
    a, b, clone = _bandpq_pair(db, refine="pq2", m2=8, nbits2=6,
                               metric="l2")
    n_in = a.merge_from(b, id_offset=2048)
    assert n_in == 1024 and a.ntotal == 3072
    # tier-2 code + s₂ tables: other's rows land verbatim at gid+2048
    np.testing.assert_array_equal(np.asarray(a._codes2)[2048:3072],
                                  np.asarray(b._codes2))
    np.testing.assert_allclose(np.asarray(a._s2)[2048:3072],
                               np.asarray(b._s2), rtol=1e-6)
    n_tiles = a._n_pad_rows // a.tile_n
    _, found = a.search(q, 10, p_tiles=n_tiles, interpret=True)
    u = clone()
    u._populate(db)
    _, fu = u.search(q, 10, p_tiles=u._n_pad_rows // u.tile_n,
                     interpret=True)
    assert abs(recall_at_k(found, gt) - recall_at_k(fu, gt)) <= 0.03


def test_band_pq_merge_from_host_refine(split_data):
    db, q, gt = split_data
    a, b, clone = _bandpq_pair(db, refine="host")
    assert a._host_scale != b._host_scale  # scale-unify path exercised
    n_in = a.merge_from(b, id_offset=2048)
    assert n_in == 1024 and a.ntotal == 3072
    # host rows of the merged half ≈ b's, requantized to the unified scale
    s = a._host_scale
    ref = np.clip(np.round(
        np.asarray(b._host_rows).astype(np.float32)
        * (b._host_scale / s)), -127, 127).astype(np.int8)
    got = np.asarray(a._host_rows)[2048:3072]
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    np.testing.assert_array_equal(a._host_assign[2048:3072],
                                  b._host_assign)
    n_tiles = a._n_pad_rows // a.tile_n
    _, found = a.search(q, 10, p_tiles=n_tiles, interpret=True)
    r = recall_at_k(found, gt)
    assert r >= 0.8, r
    _, self_hit = a.search(db[2048:2072], 1, p_tiles=n_tiles,
                           interpret=True)
    assert (self_hit[:, 0] == np.arange(2048, 2072)).mean() >= 0.9
