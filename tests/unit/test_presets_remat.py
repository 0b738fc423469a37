"""Encoder presets + remat: same outputs, gradient flows."""

import numpy as np
import jax
import jax.numpy as jnp

from cloudvectordb_tpu.models.encoder import Encoder, init_encoder
from cloudvectordb_tpu.models.presets import PRESETS, get_preset


def test_presets_resolve_and_copy():
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.hidden_dim % cfg.num_heads == 0
    a = get_preset("minilm-l6-384")
    a.hidden_dim = 1
    assert get_preset("minilm-l6-384").hidden_dim == 384  # defensive copy


def test_remat_matches_plain():
    cfg = get_preset("tiny-test")
    cfg.max_len = 16
    model, params = init_encoder(cfg, seed=0)
    rcfg = get_preset("tiny-test")
    rcfg.max_len = 16
    rcfg.remat = True
    rmodel = Encoder(rcfg)
    ids = jnp.ones((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    out = model.apply({"params": params}, ids, mask)
    out_r = rmodel.apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    # grads flow through the remat path
    def loss(p):
        return jnp.sum(rmodel.apply({"params": p}, ids, mask) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)
