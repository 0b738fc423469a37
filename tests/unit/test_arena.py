"""ListArena + PendingBuffer invariants (SURVEY.md §7.3 item 3)."""

import numpy as np

from cloudvectordb_tpu.index.arena import ListArena, PendingBuffer


def test_rebuild_sorted_and_offsets_consistent():
    rng = np.random.default_rng(0)
    n, nlist, w = 5000, 13, 6
    payload = rng.integers(0, 255, (n, w)).astype(np.uint8)
    ids = rng.permutation(n).astype(np.int64)
    assigns = rng.integers(0, nlist, n)
    ar = ListArena(nlist, w, np.uint8)
    ar.rebuild(payload, ids, assigns)
    assert ar.size == n
    assert ar.offsets[0] == 0 and ar.offsets[-1] == n
    np.testing.assert_array_equal(np.diff(ar.offsets),
                                  np.bincount(assigns, minlength=nlist))
    # rows of list l really are the rows assigned to l, in stable input order
    for l in (0, 7, 12):
        rows = np.where(assigns == l)[0]
        sl = slice(ar.offsets[l], ar.offsets[l + 1])
        np.testing.assert_array_equal(ar.ids[sl], ids[rows])
        np.testing.assert_array_equal(ar.payload[sl], payload[rows])


def test_merge_preserves_old_and_new():
    rng = np.random.default_rng(1)
    nlist, w = 5, 4
    ar = ListArena(nlist, w, np.uint8)
    p1 = rng.integers(0, 255, (100, w)).astype(np.uint8)
    a1 = rng.integers(0, nlist, 100)
    ar.rebuild(p1, np.arange(100), a1)
    p2 = rng.integers(0, 255, (40, w)).astype(np.uint8)
    a2 = rng.integers(0, nlist, 40)
    ar.merge(p2, np.arange(100, 140), a2)
    assert ar.size == 140
    all_assign = np.concatenate([a1, a2])
    np.testing.assert_array_equal(np.diff(ar.offsets),
                                  np.bincount(all_assign, minlength=nlist))
    # every original id present exactly once
    np.testing.assert_array_equal(np.sort(ar.ids), np.arange(140))


def test_pending_buffer_drain_and_snapshot():
    pb = PendingBuffer(3, np.float32)
    assert pb.snapshot() is None and pb.size == 0
    pb.append(np.ones((4, 3)), np.arange(4), np.zeros(4, np.int64))
    pb.append(2 * np.ones((2, 3)), np.arange(4, 6), np.ones(2, np.int64))
    assert pb.size == 6
    snap_p, snap_i = pb.snapshot()
    assert snap_p.shape == (6, 3) and pb.size == 6  # snapshot doesn't clear
    p, i, a = pb.drain()
    assert p.shape == (6, 3) and pb.size == 0
    np.testing.assert_array_equal(i, np.arange(6))
    np.testing.assert_array_equal(a, [0, 0, 0, 0, 1, 1])
    # drain on empty returns empty arrays
    p2, i2, a2 = pb.drain()
    assert p2.shape == (0, 3) and i2.shape == (0,)
