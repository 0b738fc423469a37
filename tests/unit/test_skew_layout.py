"""Anisotropic (cone) data support — r5 (DESIGN.md §22).

Real encoder output (mean-cos 0.98+, intrinsic dim ~5–8) makes k-means
leave hundreds of near-empty lists that pack consecutively into single
arena tiles. Three regressions are pinned here:

1. `_capacity_layout` caps the per-tile list span via tile-boundary hole
   padding (and is the identity on healthy data);
2. a skewed residual-int8 band build goes through the capped layout and
   still searches exactly (holes masked like slack);
3. the PQ-tiles family auto-shrinks tile_n to keep W within the uint8
   local code row, and fails loudly past the floor.
"""

import numpy as np
import pytest

from cloudvectordb_tpu.index.ivf_band import (
    BandIVFIndex, BandIVFPQIndex, _W_CAP)


def test_capacity_layout_caps_tile_span():
    idx = BandIVFIndex(64, nlist=2000, dtype="int8", residual=True,
                       tile_n=512)
    rng = np.random.default_rng(0)
    counts = rng.permutation(np.r_[np.full(1900, 1), np.full(100, 4000)])
    off, dest = idx._capacity_layout(counts, counts)
    assert len(np.unique(dest)) == counts.sum()  # every row placed once
    assert (np.diff(off) >= 0).all()
    # recompute the per-tile span the window computation would see
    n_t = -(-int(off[-1]) // idx.tile_n)
    starts = np.arange(n_t) * idx.tile_n
    ends = np.minimum(starts + idx.tile_n - 1, off[-1] - 1)
    fl = np.clip(np.searchsorted(off, starts, "right") - 1, 0, 1999)
    ll = np.clip(np.searchsorted(off, ends, "right") - 1, 0, 1999)
    assert int((ll - fl).max()) + 1 <= _W_CAP + 1


def test_capacity_layout_identity_on_healthy_data():
    idx = BandIVFIndex(64, nlist=500, dtype="int8", residual=True,
                       tile_n=512)
    counts = np.random.default_rng(1).integers(400, 600, 500)
    off, dest = idx._capacity_layout(counts, counts)
    np.testing.assert_array_equal(
        off, np.concatenate([[0], np.cumsum(counts)]))
    np.testing.assert_array_equal(dest, np.arange(counts.sum()))


def test_capped_assembly_masks_holes_and_maps_ids():
    """FORCED skew through `_assemble_compact`: 1500 singleton lists pack
    >128 list indices per 256-row tile, so the cap must insert hole
    padding — and the holes must stay invisible (no phantom results, ids
    preserved, planted rows retrievable at full coverage)."""
    rng = np.random.default_rng(3)
    D, tile_n = 64, 256
    n_single, n_heavy_lists, heavy_sz = 1500, 20, 500
    nlist = n_single + n_heavy_lists
    idx = BandIVFIndex(D, nlist=nlist, dtype="int8", residual=True,
                       tile_n=tile_n, tile_q=8)
    c = rng.standard_normal((nlist, D)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    idx.centroids = c
    assigns = np.r_[np.arange(n_single),
                    np.repeat(n_single + np.arange(n_heavy_lists), heavy_sz)
                    ].astype(np.int32)
    n = assigns.shape[0]
    resid = 0.01 * rng.standard_normal((n, D)).astype(np.float32)
    scale = float(np.abs(resid).max() / 127.0)
    idx._scale = scale
    q8 = np.clip(np.round(resid / scale), -127, 127).astype(np.int8)
    ids = np.arange(n, dtype=np.int64)
    idx._assemble_compact(q8, ids, assigns)

    w = idx._tile_window.shape[1]
    assert w <= _W_CAP + 1, w
    assert idx._n > n  # the cap DID insert hole padding on this layout
    assert idx.ntotal == n
    # every planted singleton row is retrievable at full coverage: its
    # centroid is ~orthogonal to every other list's, so top-1 must be the
    # row itself — a hole scored as a row (phantom centroid hit) or a
    # wrong local index would break this immediately
    sel = rng.choice(n_single, 64, replace=False)
    q = (c[assigns[sel]] + resid[sel])
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    v, f = idx.search(q, 5, p_tiles=n_tiles)
    assert (f[:, 0] == ids[sel]).mean() == 1.0
    # export drops holes exactly
    payload, gids, a2 = idx._export_rows()
    assert sorted(gids) == list(range(n))


def test_pq_fit_tile_n_shrinks_and_floors():
    idx = BandIVFPQIndex(64, nlist=3000, m=8, nbits=6, refine="none",
                         tile_n=2048, tile_q=16)
    counts = np.r_[np.full(2900, 2), np.full(100, 300)]
    idx._offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    idx._n = int(counts.sum())
    idx._fit_tile_n_to_skew(idx._n)
    assert idx.tile_n < 2048
    assert idx._compute_tile_window().shape[1] <= 256

    healthy = BandIVFPQIndex(64, nlist=100, m=8, nbits=6, refine="none",
                             tile_n=2048, tile_q=16)
    counts2 = np.full(100, 5000)
    healthy._offsets = np.concatenate([[0], np.cumsum(counts2)]).astype(
        np.int64)
    healthy._n = int(counts2.sum())
    healthy._fit_tile_n_to_skew(healthy._n)
    assert healthy.tile_n == 2048  # zero cost on healthy data


def test_pq_overflow_past_floor_fails_loudly():
    from cloudvectordb_tpu.index.ivf_band import _assert_w_fits

    fake = np.zeros((4, 300), np.int32)  # W=300 window
    with pytest.raises(AssertionError, match="uint8 local index"):
        _assert_w_fits(fake, "test")
