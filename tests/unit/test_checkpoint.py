"""Checkpoint save/restore/rotation."""

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.utils.checkpoint import (
    list_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)


def _tree(x):
    return {"w": jnp.full((3, 3), x), "nested": {"b": jnp.full((2,), x * 2.0)}}


def test_roundtrip_and_rotation(tmp_path):
    d = tmp_path / "ckpt"
    for step in (10, 20, 30, 40):
        save_checkpoint(d, step, _tree(float(step)), meta={"lr": 0.1}, keep_last=2)
    assert list_checkpoints(d) == [30, 40]
    restored, step, meta = restore_checkpoint(d, _tree(0.0))
    assert step == 40 and meta["lr"] == 0.1
    np.testing.assert_allclose(np.asarray(restored["w"]), 40.0)
    restored30, step30, _ = restore_checkpoint(d, _tree(0.0), step=30)
    assert step30 == 30
    np.testing.assert_allclose(np.asarray(restored30["nested"]["b"]), 60.0)


def test_restore_empty(tmp_path):
    tree, step, meta = restore_checkpoint(tmp_path / "none", _tree(0.0))
    assert tree is None and step == -1


def test_restore_rejects_structural_mismatch(tmp_path):
    """Same leaf COUNT, different structure → must raise, not silently load
    weights into the wrong slots."""
    import pytest

    d = tmp_path / "ckpt"
    save_checkpoint(d, 1, _tree(1.0))
    different = {"w": jnp.zeros((3, 3)), "other": {"c": jnp.zeros((2,))}}
    with pytest.raises(ValueError, match="treedef mismatch"):
        restore_checkpoint(d, different)
