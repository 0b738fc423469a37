"""Contrastive losses: known-value and ordering sanity checks."""

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.train.losses import infonce_loss, triplet_margin_loss


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_infonce_prefers_aligned():
    rng = np.random.default_rng(0)
    a = _unit(rng.normal(size=(8, 16))).astype(np.float32)
    good, acc_good = infonce_loss(jnp.asarray(a), jnp.asarray(a), temperature=0.05)
    p_bad = _unit(rng.normal(size=(8, 16))).astype(np.float32)
    bad, _ = infonce_loss(jnp.asarray(a), jnp.asarray(p_bad), temperature=0.05)
    assert float(good) < float(bad)
    assert float(acc_good) == 1.0


def test_infonce_with_explicit_negatives_raises_loss():
    rng = np.random.default_rng(1)
    a = _unit(rng.normal(size=(8, 16))).astype(np.float32)
    hard_neg = _unit(a + 0.1 * rng.normal(size=(8, 16))).astype(np.float32)
    no_neg, _ = infonce_loss(jnp.asarray(a), jnp.asarray(a))
    with_neg, _ = infonce_loss(jnp.asarray(a), jnp.asarray(a), jnp.asarray(hard_neg))
    assert float(with_neg) > float(no_neg)


def test_triplet_margin_zero_when_separated():
    a = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    p = a
    n = -a
    assert float(triplet_margin_loss(a, p, n, margin=0.5)) == 0.0
    # violating triplet: positive far, negative at anchor
    assert float(triplet_margin_loss(a, n, p, margin=0.5)) > 0.0


def test_uniformity_loss_orders_collapse_vs_spread():
    """Collapsed batch → ~0 (max penalty); spread batch → strongly negative."""
    import jax.numpy as jnp
    from cloudvectordb_tpu.train.losses import uniformity_loss

    collapsed = jnp.ones((16, 8)) / (8 ** 0.5)
    rng = np.random.default_rng(0)
    spread = rng.normal(size=(16, 8)).astype(np.float32)
    spread /= np.linalg.norm(spread, axis=1, keepdims=True)
    u_col = float(uniformity_loss(collapsed))
    u_spr = float(uniformity_loss(jnp.asarray(spread)))
    assert abs(u_col) < 1e-5
    assert u_spr < -1.0, u_spr
