"""Thin sharded-numpy checkpointing (SURVEY.md §5.4).

Training checkpoints = params + opt-state + step + RNG key + data cursor.
Atomic via tmp-dir rename; keep-last-k rotation. No orbax dependency — the
pytree is flattened to named npz entries with a JSON treedef manifest, which
keeps checkpoints portable and inspectable.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from pathlib import Path

import jax
import numpy as np

_STEP_RE = re.compile(r"^step_(\d+)$")


def _flatten(tree) -> tuple[dict[str, np.ndarray], list]:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(ckpt_dir: str | Path, step: int, tree, meta: dict | None = None,
                    keep_last: int = 3) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    arrays, treedef = _flatten(tree)
    tmp = Path(tempfile.mkdtemp(dir=ckpt_dir, prefix=".ckpt_tmp_"))
    try:
        np.savez(tmp / "arrays.npz", **arrays)
        (tmp / "meta.json").write_text(
            json.dumps({"step": step, "treedef": str(treedef), **(meta or {})})
        )
        final = ckpt_dir / f"step_{step}"
        if final.exists():
            shutil.rmtree(final)
        os.rename(tmp, final)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # rotate
    steps = sorted(list_checkpoints(ckpt_dir))
    for s in steps[:-keep_last]:
        shutil.rmtree(ckpt_dir / f"step_{s}", ignore_errors=True)
    return ckpt_dir / f"step_{step}"


def list_checkpoints(ckpt_dir: str | Path) -> list[int]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return []
    out = []
    for p in ckpt_dir.iterdir():
        m = _STEP_RE.match(p.name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def restore_checkpoint(ckpt_dir: str | Path, like_tree, step: int | None = None):
    """Restore into the structure of ``like_tree``. Returns (tree, step, meta)
    or (None, -1, {}) when no checkpoint exists."""
    steps = list_checkpoints(ckpt_dir)
    if not steps:
        return None, -1, {}
    step = steps[-1] if step is None else step
    d = Path(ckpt_dir) / f"step_{step}"
    data = np.load(d / "arrays.npz")
    meta = json.loads((d / "meta.json").read_text())
    leaves, treedef = jax.tree.flatten(like_tree)
    assert len(leaves) == len(data.files), (
        f"checkpoint has {len(data.files)} leaves, model expects {len(leaves)}"
    )
    # leaf count alone can't catch a structurally different pytree (weights
    # would silently load into the wrong slots) — the stored treedef must
    # match the restore target exactly.
    saved_td = meta.get("treedef")
    if saved_td is not None and saved_td != str(treedef):
        raise ValueError(
            f"checkpoint treedef mismatch at {d}: saved structure differs "
            f"from the restore target (same leaf count, different tree)"
        )
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves), step, meta
