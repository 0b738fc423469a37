"""Fused Pallas kernel: tiled distance + streaming bucketed top-k merge.

Why not sort: TPU has no efficient in-kernel sort, and iterative max-extraction
costs O(k) VPU passes per tile — slower than the matmul it follows. Instead we
use the bucketed-max scheme (the idea behind XLA's ApproxTopK / the TPU-KNN
"PartialReduce" approach): DB columns are strided into L ≥ k buckets
(column j belongs to bucket j mod L); the kernel keeps one running (max, argmax)
per (query, bucket) in VMEM and merges each tile with a single VPU pass. At the
end the L bucket winners per query are reduced to an exact top-k of the
candidate set with a tiny host-side ``lax.top_k``.

The result is exact unless two true top-k rows collide in the same bucket;
expected recall ≈ 1 - (k-1)/(2L), so L=1024 gives ~0.996 recall@10. Callers
needing exactness (ground truth) use ops.topk.tiled_topk.

Fusion win vs the XLA scan path: the (Q, T) score block never round-trips to
HBM — only DB tiles stream HBM→VMEM, so the scan is HBM-bandwidth-bound on the
DB bytes alone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")  # python literal: jnp scalars get captured as consts


def _bucketed_topk_kernel(
    q_ref, db_ref, nrm_ref, out_v_ref, out_i_ref, val_sc, idx_sc, *, metric, n,
    l_buckets, precision,
):
    qt = pl.program_id(0)  # query-tile index (outer)
    t = pl.program_id(1)  # db-tile index (inner; sequential on TPU core)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        val_sc[:] = jnp.full_like(val_sc, NEG_INF)
        idx_sc[:] = jnp.zeros_like(idx_sc)

    q = q_ref[:]  # (QT, D)
    tile = db_ref[:]  # (T, D)
    if q.dtype == jnp.int8:
        # int8×int8 MXU path (2× bf16 rate). Raw int32 scores merge fine:
        # per-query ordering is invariant to the positive dequant scale,
        # which the caller applies to the final top-k values.
        scores = lax.dot_general(
            q, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        # DEFAULT precision feeds the MXU bf16 operands even for f32 inputs
        # (~8-bit mantissa score noise — reorders near-ties); HIGHEST runs
        # the f32 multi-pass MXU schedule for exact-f32 scores at ~1/4 rate.
        scores = lax.dot_general(
            q, tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (QT, T)
    if metric == "l2":
        # larger-is-better: 2 q·x - ||x||² (the ||q||² constant is added back
        # by the caller so returned scores are true -||q-x||²).
        scores = 2.0 * scores - nrm_ref[:]  # nrm (1, T) broadcasts

    tile_sz = scores.shape[1]
    rows_per_bucket = tile_sz // l_buckets
    base = t * tile_sz
    if rows_per_bucket == 1:
        # L == tile: bucket b IS column b — pure elementwise merge with no
        # reduction/argmax passes (and a 2× larger candidate set)
        g = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        m = jnp.where(g < n, scores, NEG_INF)
        new_idx = g
    else:
        # global row of scores[q, r*L + b] is t*T + r*L + b
        s3 = scores.reshape(scores.shape[0], rows_per_bucket, l_buckets)
        g_idx = (
            base
            + lax.broadcasted_iota(jnp.int32, s3.shape, 1) * l_buckets
            + lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        )
        s3 = jnp.where(g_idx < n, s3, NEG_INF)  # mask DB padding
        m = jnp.max(s3, axis=1)  # (QT, L)
        # argmax along axis 1 without relying on Mosaic argmax lowering:
        # smallest r achieving the max.
        is_max = s3 >= m[:, None, :]
        r_iota = lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        r_star = jnp.min(jnp.where(is_max, r_iota, rows_per_bucket), axis=1)
        new_idx = base + r_star * l_buckets + lax.broadcasted_iota(
            jnp.int32, m.shape, 1
        )

    better = m > val_sc[:]
    val_sc[:] = jnp.where(better, m, val_sc[:])
    idx_sc[:] = jnp.where(better, new_idx, idx_sc[:])

    @pl.when(t == n_t - 1)
    def _emit():
        out_v_ref[:] = val_sc[:]
        out_i_ref[:] = idx_sc[:]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_n", "tile_q", "l_buckets",
                     "interpret", "precision"),
)
def flat_topk_pallas(
    db,
    queries,
    k: int,
    metric: str = "ip",
    db_sqnorms=None,
    tile_n: int = 2048,
    tile_q: int = 256,
    l_buckets: int = 0,
    interpret: bool = False,
    precision: str = "default",
):
    """Fused flat-scan top-k. Returns (scores (Q,k) f32, idx (Q,k) i32).

    l_buckets=0 picks max(512, 8k) rounded to a lane multiple of 128.

    precision: 'default' (MXU bf16 operands — fastest; near-tie rows within
    ~8-bit score noise may reorder vs an f32 oracle) or 'highest' (exact-f32
    multi-pass MXU schedule, ~4× the cycles — the fused ground-truth path;
    residual miss probability is the bucket-collision term alone,
    ≈ (k-1)/(2·l_buckets)). Ignored for int8 inputs (exact int32 scores).
    """
    n, d = db.shape
    nq = queries.shape[0]
    k = min(k, n)
    if precision == "highest":
        # the f32 multi-pass MXU schedule needs ~3× the operand VMEM;
        # tile_q=256 × tile_n=2048 × d=768 overflows the 16 MB scoped
        # budget (observed Mosaic compile failure) — halve the query tile
        tile_q = min(tile_q, 128)
    if l_buckets == 0:
        l_buckets = tile_n  # R=1: elementwise merge (fastest, biggest pool)
    l_buckets = min(l_buckets, tile_n)
    assert tile_n % l_buckets == 0, (tile_n, l_buckets)

    d_pad = _ceil_to(d, 128)
    n_pad = _ceil_to(n, tile_n)
    q_pad = _ceil_to(nq, tile_q)
    dbp = jnp.zeros((n_pad, d_pad), db.dtype).at[:n, :d].set(db)
    qp = jnp.zeros((q_pad, d_pad), queries.dtype).at[:nq, :d].set(queries)
    if metric == "l2":
        if db_sqnorms is None:
            db_sqnorms = jnp.sum(
                db.astype(jnp.float32) * db.astype(jnp.float32), axis=1
            )
        nrm = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
            db_sqnorms.astype(jnp.float32)
        )
    else:
        nrm = jnp.zeros((1, n_pad), jnp.float32)

    grid = (q_pad // tile_q, n_pad // tile_n)
    kernel = functools.partial(
        _bucketed_topk_kernel, metric=metric, n=n, l_buckets=l_buckets,
        precision={"default": lax.Precision.DEFAULT,
                   "highest": lax.Precision.HIGHEST}[precision],
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, l_buckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, l_buckets), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, l_buckets), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, l_buckets), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, l_buckets), jnp.float32),
            pltpu.VMEM((tile_q, l_buckets), jnp.int32),
        ],
        interpret=interpret,
    )(qp, dbp, nrm)

    cand_v = out_v[:nq]
    cand_i = out_i[:nq]
    top_v, pos = lax.top_k(cand_v, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    if metric == "l2":
        q_sqnorm = jnp.sum(
            queries.astype(jnp.float32) * queries.astype(jnp.float32), axis=1
        )
        top_v = top_v - q_sqnorm[:, None]
    return top_v, top_i


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_q", "l_buckets", "interpret")
)
def flat_topk_pallas_int8(
    db_i8,
    db_scale,
    queries,
    k: int,
    tile_n: int = 2048,
    tile_q: int = 256,
    l_buckets: int = 0,
    interpret: bool = False,
):
    """int8×int8 fused IP scan: 2× MXU rate and 4× less HBM than f32.

    db_i8 (N, D) int8 with symmetric dequant scale ``db_scale``; queries f32
    are quantized per-query on device. Returned scores are dequantized
    approximate inner products; ordering fidelity ≈ 8-bit.
    """
    q_amax = jnp.maximum(jnp.max(jnp.abs(queries), axis=1, keepdims=True), 1e-12)
    q_scale = q_amax / 127.0  # (Q, 1)
    q_i8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
    top_v, top_i = flat_topk_pallas(
        db_i8, q_i8, k, metric="ip",
        tile_n=tile_n, tile_q=tile_q, l_buckets=l_buckets, interpret=interpret,
    )
    return top_v * (q_scale * db_scale), top_i
