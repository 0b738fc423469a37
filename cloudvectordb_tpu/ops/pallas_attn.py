"""Fused multi-head attention for SHORT-SEQUENCE, SMALL-HEAD encoders.

The stock TPU flash-attention kernel is built for long sequences and
≥128-wide heads: it streams K/V in 128-row blocks with an online softmax,
and lane-pads the head dim to 128 — at MiniLM geometry (L=128, head_dim=32)
that padding is a measured 4× loss (bench_encode r4: fwd 8.9k → 5.9k
passages/s, bwd OOM), while the naive XLA path writes three (B, H, L, L)
f32 tensors to HBM per layer (~2.2 GB at the training shape).

The TPU-first observation for encoder workloads: at L ≤ ~512 the ENTIRE
attention of one sequence fits in VMEM, so no online softmax or K/V
streaming is needed at all. This kernel grids over sequences; each step
DMAs the sequence's q/k/v as (L, H·d) blocks — head-packed in the LANE
dimension (12 × 32 = 384 lanes, zero padding) — and loops statically over
heads: per head one (L, d)·(d, L) MXU dot, an in-VMEM masked softmax, one
(L, L)·(L, d) dot. The (L, L) scores live and die in VMEM; HBM traffic is
exactly q, k, v in and out out (~0.4 MB/seq vs the naive path's ~1.4 MB of
L² tensors per LAYER per seq).

The backward pass recomputes the (L, L) probabilities per sequence (they
were never stored — rematerialization is one extra dot per head, cheap at
d=32) and emits dq, dk, dv in a single grid pass; per-sequence grads are
independent, so there is no cross-step accumulation.

Padding rides the key mask: pad KEYS are masked to -inf before softmax
(pad queries produce garbage rows that masked mean-pooling drops, same as
the naive path). No attention-probs dropout (use attn_dropout=0.0 —
models/encoder.py gates on it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, heads, d, scale):
    q = q_ref[0].astype(jnp.float32)          # (L, H·d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    allow = m_ref[0] > 0                      # (1, L) key mask — the mask
    neg = jnp.float32(-1e30)                  # rides as (B, 1, L) so its
    for i in range(heads):                    # block satisfies Mosaic's
                                              # (sublane, lane) rules
        sl = slice(i * d, (i + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (L, L)
        s = jnp.where(allow, s, neg)
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, heads, d, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    allow = m_ref[0] > 0
    neg = jnp.float32(-1e30)
    for i in range(heads):
        sl = slice(i * d, (i + 1) * d)
        qh, kh, vh, doh = q[:, sl] * scale, k[:, sl], v[:, sl], do[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(allow, s, neg)
        s = s - jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=1, keepdims=True)        # (L, L) remat
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        dq_ref[0, :, sl] = (scale * jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _call(kernel, outs, args, L, hd, interpret):
    blk = pl.BlockSpec((1, L, hd), lambda b: (b, 0, 0))
    mblk = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0))
    n_out = len(outs)
    q, k, v, mask, *rest = args
    args = (q, k, v, mask.reshape(mask.shape[0], 1, mask.shape[1]), *rest)
    return pl.pallas_call(
        kernel,
        grid=(args[0].shape[0],),
        in_specs=[blk, blk, blk, mblk] + [blk] * (len(args) - 4),
        out_specs=blk if n_out == 1 else [blk] * n_out,
        out_shape=outs if n_out > 1 else outs[0],
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def mha_small_head(q, k, v, mask, heads: int, d: int, scale: float,
                   interpret: bool = False):
    """Fused MHA for head-packed (B, L, H·d) inputs; mask (B, L) keys.

    Returns (B, L, H·d) in q's dtype. Differentiable (custom VJP, one
    recompute-and-grad grid pass). L must satisfy L % 128 == 0 and the
    per-sequence working set must fit VMEM (L ≤ ~512 at H·d = 384)."""
    return _mha_fwd(q, k, v, mask, heads, d, scale, interpret)[0]


def _mha_fwd(q, k, v, mask, heads, d, scale, interpret):
    L, hd = q.shape[1], q.shape[2]
    out = _call(
        functools.partial(_fwd_kernel, heads=heads, d=d, scale=scale),
        [jax.ShapeDtypeStruct(q.shape, q.dtype)],
        (q, k, v, mask), L, hd, interpret)
    return out, (q, k, v, mask)

def _mha_bwd(heads, d, scale, interpret, res, do):
    q, k, v, mask = res
    L, hd = q.shape[1], q.shape[2]
    dq, dk, dv = _call(
        functools.partial(_bwd_kernel, heads=heads, d=d, scale=scale),
        [jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        (q, k, v, mask, do), L, hd, interpret)
    return dq, dk, dv, None


mha_small_head.defvjp(_mha_fwd, _mha_bwd)
