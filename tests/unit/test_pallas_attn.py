"""Packed small-head fused attention (ops/pallas_attn.py, r4): interpret-
mode parity of forward AND custom-VJP gradients against the naive einsum
attention, with real key padding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cloudvectordb_tpu.ops.pallas_attn import mha_small_head

B, L, H, D = 4, 128, 12, 32
SCALE = D ** -0.5


@pytest.fixture(scope="module")
def qkvm():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, H * D)).astype(np.float32))
               for _ in range(3))
    mask = np.ones((B, L), np.int32)
    mask[:, 100:] = 0  # real key padding
    return q, k, v, jnp.asarray(mask)


def _ref(q, k, v, mask):
    qh, kh, vh = (x.reshape(B, L, H, D) for x in (q, k, v))
    s = jnp.einsum("bqhd,bkhd->bhqk", qh * SCALE, kh)
    s = jnp.where((mask > 0)[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, L, H * D)


def test_packed_attention_fwd_parity(qkvm):
    q, k, v, mask = qkvm
    out = mha_small_head(q, k, v, mask, H, D, SCALE, True)
    ref = _ref(q, k, v, mask)
    valid = (np.asarray(mask) > 0)[..., None]
    np.testing.assert_allclose(np.asarray(out) * valid,
                               np.asarray(ref) * valid, atol=2e-5)


def test_packed_attention_grad_parity(qkvm):
    q, k, v, mask = qkvm
    valid = jnp.asarray((np.asarray(mask) > 0)[..., None].astype(np.float32))

    def loss_k(q, k, v):
        return jnp.sum((mha_small_head(q, k, v, mask, H, D, SCALE, True)
                        * valid) ** 2)

    def loss_r(q, k, v):
        return jnp.sum((_ref(q, k, v, mask) * valid) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_packed_attention_bf16(qkvm):
    """bf16 inputs (the training dtype): outputs match the f32 reference
    within bf16 rounding."""
    q, k, v, mask = qkvm
    out = mha_small_head(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16), mask, H, D, SCALE, True)
    ref = _ref(q, k, v, mask)
    valid = (np.asarray(mask) > 0)[..., None]
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)) * valid
    assert err.max() < 0.05, err.max()
