"""IVF list arena: variable-length lists under XLA's static shapes.

SURVEY.md §7.3 item 3: lists are flattened into one contiguous arena sorted by
list id, with (nlist+1,) offsets. Searches gather fixed-cap windows per probed
list and mask the tail — static shapes for XLA, no per-list padding stored in
HBM.

Incremental insert (BASELINE config #5) is LSM-style: new vectors append to a
*pending* flat buffer (scanned exactly at query time); when pending exceeds a
fraction of the arena it is merged in one re-sort. This keeps `add` O(batch)
amortized while the arena stays contiguous for the hot scan.
"""

from __future__ import annotations

import numpy as np


def normalize_remove_ids(ids) -> np.ndarray:
    """The remove() request contract, shared by every index family:
    any int array-like → sorted unique non-negative int64 ids (negative
    entries — the hole marker value — are silently dropped)."""
    req = np.unique(np.asarray(ids, np.int64).ravel())
    return req[req >= 0]


def grow_scatter_gid(base: np.ndarray, rows: np.ndarray,
                     gids: np.ndarray) -> np.ndarray:
    """Grow a gid-keyed table to cover `gids` (zero-filling any id-space
    gaps) and scatter `rows` at those keys — the merge_from consolidation
    primitive for every gid-keyed side store (int8 refine rows, pq2
    codes, s₂ scalars, host rows, assignment tables)."""
    base = np.asarray(base)
    hi = max(int(gids.max(initial=-1)) + 1, base.shape[0])
    out = np.zeros((hi, *base.shape[1:]), base.dtype)
    out[: base.shape[0]] = base
    out[gids] = rows
    return out


class ListArena:
    """Host-side container for list-sorted payload rows + original ids."""

    def __init__(self, nlist: int, payload_width: int, payload_dtype):
        self.nlist = nlist
        self.payload = np.zeros((0, payload_width), payload_dtype)
        self.ids = np.zeros((0,), np.int64)
        self.offsets = np.zeros((nlist + 1,), np.int64)

    @property
    def size(self) -> int:
        return self.payload.shape[0]

    @property
    def list_lens(self) -> np.ndarray:
        return np.diff(self.offsets)

    @property
    def max_list_len(self) -> int:
        return int(self.list_lens.max()) if self.size else 0

    def rebuild(self, payload: np.ndarray, ids: np.ndarray, assignments: np.ndarray):
        """Replace contents with rows sorted by list assignment (stable).

        Uses the native parallel counting sort (utils/native.py) — at 100M+
        rows this is the host-side build bottleneck."""
        from cloudvectordb_tpu.utils.native import arena_sort, gather_rows

        order, offsets = arena_sort(np.asarray(assignments), self.nlist)
        self.payload = gather_rows(np.asarray(payload), order)
        self.ids = np.asarray(ids)[order]
        self.offsets = offsets

    def merge(self, payload: np.ndarray, ids: np.ndarray, assignments: np.ndarray):
        """Merge new rows in (single re-sort of the union)."""
        if self.size == 0:
            self.rebuild(payload, ids, assignments)
            return
        old_assign = np.repeat(np.arange(self.nlist), self.list_lens)
        self.rebuild(
            np.concatenate([self.payload, payload.astype(self.payload.dtype)]),
            np.concatenate([self.ids, ids]),
            np.concatenate([old_assign, assignments]),
        )

    def remove_ids(self, req: np.ndarray) -> int:
        """Drop rows whose id is in ``req`` (sorted unique int64): one
        boolean-mask compaction. Rows stay list-sorted (keep preserves
        order), so only the offsets need recomputing. Returns the number
        of rows removed; unknown ids are ignored."""
        if self.size == 0:
            return 0
        keep = ~np.isin(self.ids, req)
        n_rem = int(self.size - keep.sum())
        if n_rem == 0:
            return 0
        assign = np.repeat(np.arange(self.nlist), self.list_lens)[keep]
        # fancy indexing copies — safe on read-only mmap'd views too
        self.payload = np.asarray(self.payload)[keep]
        self.ids = np.asarray(self.ids)[keep]
        counts = np.bincount(assign, minlength=self.nlist)
        self.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return n_rem


class PendingBuffer:
    """Flat append-only buffer for not-yet-merged inserts."""

    def __init__(self, payload_width: int, payload_dtype):
        self._chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.width = payload_width
        self.dtype = payload_dtype

    @property
    def size(self) -> int:
        return sum(c[0].shape[0] for c in self._chunks)

    def append(self, payload, ids, assignments):
        self._chunks.append(
            (np.asarray(payload, self.dtype), np.asarray(ids), np.asarray(assignments))
        )

    def drain(self):
        snap = self.snapshot_full()
        if snap is None:
            e = np.zeros((0, self.width), self.dtype)
            return e, np.zeros((0,), np.int64), np.zeros((0,), np.int64)
        self._chunks.clear()
        return snap

    def snapshot(self):
        """Concatenated view without clearing (for search over pending rows)."""
        snap = self.snapshot_full()
        return None if snap is None else snap[:2]

    def snapshot_full(self):
        """Concatenated (payload, ids, assignments) without clearing — the
        assignments let residual-encoded pending rows rebuild their
        centroid term."""
        if not self._chunks:
            return None
        p = np.concatenate([c[0] for c in self._chunks])
        i = np.concatenate([c[1] for c in self._chunks])
        a = np.concatenate([c[2] for c in self._chunks])
        return p, i, a

    def remove_ids(self, req: np.ndarray) -> tuple[int, list[np.ndarray]]:
        """Drop pending rows whose id is in ``req``. Returns
        (n_removed, keep_masks) — one boolean mask per ORIGINAL chunk, in
        order, so callers with chunk-parallel side lists (e.g. PQ codes
        appended alongside each pending chunk) can filter them with the
        same masks. Chunks that end up empty are removed."""
        masks: list[np.ndarray] = []
        n_rem = 0
        kept: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for p, i, a in self._chunks:
            keep = ~np.isin(i, req)
            masks.append(keep)
            n_rem += int(i.shape[0] - keep.sum())
            if keep.all():
                kept.append((p, i, a))
            elif keep.any():
                kept.append((p[keep], i[keep], a[keep]))
        self._chunks = kept
        return n_rem, masks
