"""metric='l2' on the band family (r3): in-kernel derived bias
−‖x̂‖²/2 in the residual and PQ tiles kernels (no stored norms — see
ops/pallas_band.py::_tiles_resid_kernel), −‖q−x̂‖² score convention
shared with FlatIndex/IVFFlat, and l2-aware pending/annex/refine paths.

Data is deliberately UNNORMALIZED (strong per-row norm spread): inner
product and L2 rank differently, so an un-biased (IP) scan measurably
fails the L2 oracle — the control every test leans on."""

import numpy as np
import pytest

from cloudvectordb_tpu.data.synthetic import clustered_vectors
from cloudvectordb_tpu.eval.recall import recall_at_k
from cloudvectordb_tpu.index.ivf_band import BandIVFIndex, BandIVFPQIndex


def _unnorm(n, d, seed):
    """Clustered vectors with a 6× per-row norm spread."""
    x = clustered_vectors(n, d, n_clusters=24, seed=seed, normalize=True)
    rng = np.random.default_rng(seed + 1)
    return (x * rng.uniform(0.5, 3.0, (n, 1))).astype(np.float32)


def _l2_oracle(db, q, k):
    d2 = (
        np.sum(q * q, axis=1, keepdims=True)
        - 2.0 * (q @ db.T)
        + np.sum(db * db, axis=1)[None, :]
    )
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


@pytest.fixture(scope="module")
def data():
    db = _unnorm(4000, 64, seed=400)
    q = db[:32] + 0.05 * np.random.default_rng(402).standard_normal(
        (32, 64)).astype(np.float32)
    return db, q


def test_band_resid_l2_vs_oracle(data):
    db, q = data
    gt = _l2_oracle(db, q, 10)
    idx = BandIVFIndex.build(db, nlist=16, dtype="int8", residual=True,
                             kmeans_iters=6, tile_n=256, tile_q=16,
                             metric="l2")
    p_all = int(np.asarray(idx._payload).shape[0]) // idx.tile_n
    v, f = idx.search(q, 10, interpret=True, p_tiles=p_all)
    r_l2 = recall_at_k(f, gt)
    assert r_l2 >= 0.9, r_l2
    # control: the SAME arena ranked by IP misses the L2 oracle badly —
    # proving the in-kernel bias is what closes the gap
    idx_ip = BandIVFIndex.build(db, nlist=16, dtype="int8", residual=True,
                                kmeans_iters=6, tile_n=256, tile_q=16)
    _, f_ip = idx_ip.search(q, 10, interpret=True, p_tiles=p_all)
    assert recall_at_k(f_ip, gt) < r_l2 - 0.15
    # score convention: −‖q − x̂‖² against the index's own reconstructions
    flat = f.ravel()
    xhat = idx.reconstruct(flat).reshape(32, 10, -1)
    d2 = np.sum((q[:, None, :] - xhat) ** 2, axis=2)
    np.testing.assert_allclose(v, -d2, rtol=2e-2, atol=5e-2)


def test_band_l2_rejects_non_residual():
    with pytest.raises(AssertionError):
        BandIVFIndex(64, 16, dtype="int8", metric="l2")
    with pytest.raises(AssertionError):
        BandIVFIndex(64, 16, dtype="float32", metric="l2")


def test_band_l2_pending_annex_and_filters(data):
    db, q = data
    idx = BandIVFIndex.build(db[:3200], nlist=16, dtype="int8",
                             residual=True, kmeans_iters=6, tile_n=128,
                             tile_q=16, metric="l2")
    for s in range(0, 800, 200):  # spans pending + annex folds
        idx.add(db[3200 + s : 3400 + s])
    gt = _l2_oracle(db, q, 10)
    p_all = int(np.asarray(idx._payload).shape[0]) // idx.tile_n
    v, f = idx.search(q, 10, interpret=True, p_tiles=p_all)
    assert recall_at_k(f, gt) >= 0.9
    # added rows are retrievable as their own L2 nearest neighbor
    qa = db[3200:3232]
    _, fa = idx.search(qa, 1, interpret=True, p_tiles=p_all)
    assert (fa[:, 0] == np.arange(3200, 3232)).mean() >= 0.9
    # filtered l2: restricted oracle, no disallowed ids
    rng = np.random.default_rng(5)
    mask = rng.random(4000) < 0.5
    gt_f = np.asarray(_l2_oracle(db, q, 200))
    gt_f = np.stack([row[mask[row]][:10] for row in gt_f])
    vf, ff = idx.search(q, 10, interpret=True, p_tiles=p_all, where=mask)
    assert mask[ff[ff >= 0]].all()
    assert (ff[:, 0] == gt_f[:, 0]).mean() >= 0.85
    # remove the current top-1s; they must vanish from results
    top1 = np.unique(f[:, 0])
    idx.remove(top1)
    _, f2 = idx.search(q, 10, interpret=True, p_tiles=p_all)
    assert not np.isin(f2, top1).any()


def test_band_l2_save_load_roundtrip(tmp_path, data):
    db, q = data
    idx = BandIVFIndex.build(db, nlist=16, dtype="int8", residual=True,
                             kmeans_iters=6, tile_n=256, tile_q=16,
                             metric="l2")
    p_all = int(np.asarray(idx._payload).shape[0]) // idx.tile_n
    v1, f1 = idx.search(q, 10, interpret=True, p_tiles=p_all)
    idx.save(tmp_path / "l2idx")
    from cloudvectordb_tpu.index.registry import load_index

    idx2 = load_index(tmp_path / "l2idx")
    assert idx2.metric == "l2"
    v2, f2 = idx2.search(q, 10, interpret=True, p_tiles=p_all)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)


def test_pq_family_l2_both_serving_forms(data):
    db, q = data
    gt = _l2_oracle(db, q, 10)
    idx = BandIVFPQIndex.build(db, nlist=16, m=8, nbits=6, refine="int8",
                               opq=True, kmeans_iters=5, pq_train_iters=5,
                               tile_n=256, tile_q=16, metric="l2")
    n_tiles = idx._n_pad_rows // idx.tile_n
    v, f = idx.search(q, 10, interpret=True, p_tiles=n_tiles,
                      serve_from="refine")
    assert recall_at_k(f, gt) >= 0.9
    v2, f2 = idx.search(q, 10, interpret=True, p_tiles=n_tiles,
                        serve_from="pq", refine_factor=16)
    assert recall_at_k(f2, gt) >= 0.85
    # control: ip-metric build on the same data misses the L2 oracle
    idx_ip = BandIVFPQIndex.build(db, nlist=16, m=8, nbits=6, refine="int8",
                                  opq=True, kmeans_iters=5, pq_train_iters=5,
                                  tile_n=256, tile_q=16)
    _, f_ip = idx_ip.search(q, 10, interpret=True, p_tiles=n_tiles,
                            serve_from="refine")
    assert recall_at_k(f_ip, gt) < recall_at_k(f, gt) - 0.15


def test_pq_family_l2_pq2_and_host_tiers(data):
    db, q = data
    gt = _l2_oracle(db, q, 10)
    # pq2: tier-2 correction doubled on −d² keys (first-order; kernel doc)
    idx = BandIVFPQIndex.build(db, nlist=16, m=8, nbits=6, refine="pq2",
                               m2=16, kmeans_iters=5, pq_train_iters=5,
                               tile_n=256, tile_q=16, metric="l2")
    n_tiles = idx._n_pad_rows // idx.tile_n
    v, f = idx.search(q, 10, interpret=True, p_tiles=n_tiles,
                      refine_factor=16)
    r_pq2 = recall_at_k(f, gt)
    assert r_pq2 >= 0.6, r_pq2  # approximate-rescorer bound on this data
    # host: exact rescore must reach near-oracle
    idxh = BandIVFPQIndex.build(db, nlist=16, m=8, nbits=6, refine="host",
                                kmeans_iters=5, pq_train_iters=5,
                                tile_n=256, tile_q=16, metric="l2")
    vh, fh = idxh.search(q, 10, interpret=True, p_tiles=n_tiles,
                         refine_factor=32)
    assert recall_at_k(fh, gt) >= 0.9
    # host l2 keys are exact −‖q−x‖² of the int8-reconstructed rows
    assert (vh[:, 0] <= 0).all()


def test_sharded_band_l2_parity(data):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from cloudvectordb_tpu.parallel.dist_band import ShardedBandIndex

    db, q = data
    gt = _l2_oracle(db, q, 10)
    sh = ShardedBandIndex.build(db, nlist=16, dtype="int8", residual=True,
                                kmeans_iters=6, tile_n=128, tile_q=16,
                                metric="l2")
    n_tiles = int(sh._device_state()["n_tiles"])
    v, f = sh.search(q, 10, p_tiles=n_tiles)
    assert recall_at_k(f, gt) >= 0.9
