"""Native arena sort: parity with numpy + actually builds on this machine."""

import numpy as np

from cloudvectordb_tpu.utils import native


def test_arena_sort_parity():
    rng = np.random.default_rng(0)
    n, nlist = 100_000, 257
    assign = rng.integers(0, nlist, n).astype(np.int32)
    order, offsets = native.arena_sort(assign, nlist)
    # sorted by list id, stable within list
    s = assign[order]
    assert (np.diff(s) >= 0).all()
    for l in (0, 17, 256):
        rows = order[offsets[l] : offsets[l + 1]]
        assert (assign[rows] == l).all()
        assert (np.diff(rows) > 0).all()  # stability: input order preserved
    counts = np.bincount(assign, minlength=nlist)
    np.testing.assert_array_equal(np.diff(offsets), counts)


def test_native_lib_compiles_here():
    # this environment has g++: the fast path must actually be used
    assert native._load() is not None


def test_gather_rows_parity():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 255, (5000, 48)).astype(np.uint8)
    order = rng.permutation(5000).astype(np.int64)
    np.testing.assert_array_equal(native.gather_rows(src, order), src[order])
    srcf = rng.normal(size=(1000, 12)).astype(np.float32)
    order2 = rng.permutation(1000).astype(np.int64)
    np.testing.assert_array_equal(native.gather_rows(srcf, order2), srcf[order2])
