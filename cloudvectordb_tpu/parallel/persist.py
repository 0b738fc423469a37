"""Sharded-index persistence (SURVEY.md §2.2 persistence row, round-3).

A sharded index saves as ONE directory:

    path/
      sharded.json          top-level manifest: sharded kind, shard count,
                            wrapper config, per-shard dir names + extras
      shard_000/            each shard is a normal single-index artifact
        manifest.json       (atomic dir, mmap-able .npy arrays, hashes —
        *.npy                index/base.py scheme, reused verbatim)
      shard_001/ ...
      <extra>_000.npy ...   wrapper-level per-shard arrays (e.g. refine rows)

The whole save is atomic (write into a tmp dir, one rename), like
``Index.save``. Loading reconstructs the wrapper against a caller-supplied
``jax.sharding.Mesh`` (or a fresh 1-D 'shard' mesh sized from the manifest)
and re-stages shards onto devices lazily via ``stage_row_sharded`` on the
first search — the 27-minute config-#4 build artifact survives the process.
"""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import numpy as np

SHARDED_MANIFEST = "sharded.json"
SHARDED_FORMAT_VERSION = 1


def is_sharded_artifact(path: str | Path) -> bool:
    return (Path(path) / SHARDED_MANIFEST).exists()


def save_sharded(
    path: str | Path,
    manifest: dict,
    shards,
    extras_per_shard: dict[str, list[np.ndarray | None]] | None = None,
) -> None:
    """Write shards + wrapper manifest atomically.

    ``shards``: list of single Index objects (each saved with its own atomic
    ``Index.save`` into the tmp dir). ``extras_per_shard`` maps array name →
    one (possibly None) numpy array per shard, stored as ``{name}_{si}.npy``.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(dir=path.parent, prefix=".shidx_tmp_"))
    try:
        shard_dirs = []
        for si, sh in enumerate(shards):
            name = f"shard_{si:03d}"
            sh.save(tmp / name)
            shard_dirs.append(name)
        extras_present: dict[str, list[bool]] = {}
        for name, arrs in (extras_per_shard or {}).items():
            present = []
            for si, arr in enumerate(arrs):
                if arr is not None:
                    np.save(tmp / f"{name}_{si:03d}.npy", np.asarray(arr))
                present.append(arr is not None)
            extras_present[name] = present
        top = {
            "format_version": SHARDED_FORMAT_VERSION,
            "nshards": len(shard_dirs),
            "shard_dirs": shard_dirs,
            "extras": extras_present,
            **manifest,
        }
        (tmp / SHARDED_MANIFEST).write_text(json.dumps(top, indent=2))
        from cloudvectordb_tpu.index.base import replace_dir_atomic

        replace_dir_atomic(tmp, path, ".shidx_old_")
    finally:
        if tmp.exists():
            shutil.rmtree(tmp, ignore_errors=True)


def read_sharded_manifest(path: str | Path) -> dict:
    return json.loads((Path(path) / SHARDED_MANIFEST).read_text())


def load_shards(path: str | Path, manifest: dict, mmap: bool = True) -> list:
    """Load each shard sub-artifact via the polymorphic single-index loader."""
    from cloudvectordb_tpu.index.registry import load_index

    return [
        load_index(Path(path) / name, mmap=mmap)
        for name in manifest["shard_dirs"]
    ]


def load_extras(path: str | Path, manifest: dict, name: str,
                mmap: bool = True) -> list[np.ndarray | None]:
    """Per-shard wrapper arrays saved by ``save_sharded``."""
    mode = "r" if mmap else None
    out = []
    for si, present in enumerate(manifest.get("extras", {}).get(name, [])):
        out.append(
            np.load(Path(path) / f"{name}_{si:03d}.npy", mmap_mode=mode)
            if present else None
        )
    return out
