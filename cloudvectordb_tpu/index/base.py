"""Index protocol + persistence manifest (SURVEY.md §2.2, §5.4).

Every index saves as a directory: ``manifest.json`` (kind, config, counts,
config/encoder hashes for compatibility checks — the encoder is part of the DB
per the reference pipeline, /root/reference/README.md:2) plus ``arrays.npz``
with the numeric payload. Atomic via write-to-tmp + rename.
"""

from __future__ import annotations

import abc
import json
import os
import tempfile
from pathlib import Path

import numpy as np

from cloudvectordb_tpu.eval.tune import TunableMixin
from cloudvectordb_tpu.index.range import RangeSearchMixin

MANIFEST = "manifest.json"
ARRAYS = "arrays.npz"
FORMAT_VERSION = 1


def replace_dir_atomic(tmp: Path, path: Path, old_prefix: str) -> None:
    """Swap a fully-written ``tmp`` dir into ``path``, moving any existing
    artifact ASIDE first (never delete-then-rename: a crash in that window
    would destroy the only copy of a multi-minute build). Worst case after
    a crash here: a complete artifact exists at ``path``, in ``tmp``, or in
    the ``old_prefix`` aside dir — something always survives on disk.
    Shared by Index.save and parallel/persist.py::save_sharded."""
    import shutil

    old = None
    if path.exists():
        old = Path(tempfile.mkdtemp(dir=path.parent, prefix=old_prefix)) / "prev"
        os.rename(path, old)
    os.rename(tmp, path)
    if old is not None:
        shutil.rmtree(old.parent, ignore_errors=True)


class Index(TunableMixin, RangeSearchMixin, abc.ABC):
    """Build/add/search/save/load surface shared by Flat, IVF-Flat, IVF-PQ.

    Tuning (``tune()``/``_op_point``) comes from eval/tune.py's
    TunableMixin, radius queries from index/range.py's RangeSearchMixin —
    one implementation of each, shared with the sharded wrappers."""

    kind: str = "abstract"
    metric: str = "ip"
    dim: int = 0

    @property
    @abc.abstractmethod
    def ntotal(self) -> int:
        ...

    @abc.abstractmethod
    def add(self, vectors) -> None:
        """Append vectors (N, dim); ids are assigned contiguously."""

    @abc.abstractmethod
    def search(self, queries, k: int, **kw) -> tuple[np.ndarray, np.ndarray]:
        """Return (scores (Q, k), ids (Q, k)); larger score is better."""

    # -- persistence ------------------------------------------------------
    @abc.abstractmethod
    def _state_arrays(self) -> dict[str, np.ndarray]:
        ...

    @abc.abstractmethod
    def _state_meta(self) -> dict:
        ...

    @classmethod
    @abc.abstractmethod
    def _from_state(cls, meta: dict, arrays: dict) -> "Index":
        ...

    def save(self, path: str | Path, extra_meta: dict | None = None) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = Path(tempfile.mkdtemp(dir=path.parent, prefix=".idx_tmp_"))
        try:
            # arrays first: _state_arrays may fold pending LSM inserts into
            # the arena, which updates the counts _state_meta records
            arrays = self._state_arrays()
            manifest = {
                "format_version": FORMAT_VERSION,
                "kind": self.kind,
                "metric": self.metric,
                "dim": self.dim,
                "ntotal": self.ntotal,
                "meta": self._state_meta(),
                "op_point": self._op_point,
                **(extra_meta or {}),
            }
            manifest["arrays"] = sorted(arrays)
            (tmp / MANIFEST).write_text(json.dumps(manifest, indent=2))
            # one .npy per array (not npz): load_arrays can memory-map GB-scale
            # payloads for staged host→HBM upload (SURVEY.md §2.2 persistence)
            for name, arr in arrays.items():
                np.save(tmp / f"{name}.npy", np.asarray(arr))
            replace_dir_atomic(tmp, path, ".idx_old_")
        finally:
            if tmp.exists():
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)

    @staticmethod
    def read_manifest(path: str | Path) -> dict:
        return json.loads((Path(path) / MANIFEST).read_text())

    @staticmethod
    def load_arrays(path: str | Path, mmap: bool = True) -> dict:
        """Load saved arrays; mmap=True maps large payloads lazily so a
        100M-vector index streams host→HBM without a full host copy."""
        path = Path(path)
        manifest = Index.read_manifest(path)
        mode = "r" if mmap else None
        out = {}
        for name in manifest.get("arrays", []):
            out[name] = np.load(path / f"{name}.npy", mmap_mode=mode)
        if not out and (path / ARRAYS).exists():  # legacy npz fallback
            out = dict(np.load(path / ARRAYS))
        return out
