"""Band-pruned IVF scan — the TPU-native answer to per-query list probing.

Problem (SURVEY.md §7.3 items 2-3): classic IVF search gathers each query's
nprobe lists — random gathers and dynamic shapes, both TPU-hostile. At large
batch the union of probed lists approaches the whole index, so *IO* can't be
pruned — but *compute* can, if queries that probe the same lists are scored
against the same tiles.

Scheme:
  1. (build time) Relabel coarse centroids along a 1-D locality order
     (projection onto their top principal component): queries then probe
     lists whose NEW ids are contiguous-ish.
  2. (query time, XLA) coarse top-nprobe per query → per-query id band
     [min probed, max probed]; sort queries by band center; tile queries.
     Each query tile's band = union of its queries' bands → an arena row
     range → a contiguous range of fixed-size arena tiles.
  3. (kernel) grid (query_tile, band_tile); the scalar-prefetched band-start
     table drives the DB BlockSpec index_map, so each query tile streams ONLY
     its band. Short bands clamp to their last tile (idempotent bucketed-max
     merge makes duplicate tiles harmless).

Scoring a band is a *superset* of the probed lists, so recall ≥ classic IVF
at equal nprobe. Compute per query ≈ band_fraction × full scan; with locality
ordering the band is a few× nprobe/nlist, giving a 10–50× prune with zero
gathers and fully static shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def order_centroids(centroids: np.ndarray) -> np.ndarray:
    """Locality-preserving centroid permutation: recursive balanced 2-means.

    A 1-D projection (PC1, space-filling curve) cannot localize 768-d probe
    sets (measured: bands/unions degenerate to the whole arena). The
    hierarchical ordering puts genuinely similar centroids at adjacent ids at
    EVERY scale — a query's nprobe nearest lists then concentrate in a small
    id range, so query tiles (sorted by top-1 id) share small tile unions.
    """
    c = np.asarray(centroids, np.float64)
    rng = np.random.default_rng(0)

    def rec(idx: np.ndarray) -> list[int]:
        if len(idx) <= 2:
            return idx.tolist()
        sub = c[idx]
        # 2-means direction (few Lloyd rounds), then a balanced median split
        picks = rng.choice(len(idx), 2, replace=False)
        c0, c1 = sub[picks[0]].copy(), sub[picks[1]].copy()
        for _ in range(6):
            d0 = ((sub - c0) ** 2).sum(1)
            d1 = ((sub - c1) ** 2).sum(1)
            m = d0 <= d1
            if m.any():
                c0 = sub[m].mean(0)
            if (~m).any():
                c1 = sub[~m].mean(0)
        proj = sub @ (c1 - c0)
        order = np.argsort(proj, kind="stable")
        half = len(idx) // 2
        return rec(idx[order[:half]]) + rec(idx[order[half:]])

    return np.asarray(rec(np.arange(len(c))), dtype=np.int64)


def _score_tile(q, tile, int8):
    """Q·tileᵀ under the selected scoring mode.

    int8=True   — int8 queries × int8 rows on the int8 MXU path (fastest).
    int8='hybrid' — int8 STORAGE (1 byte/row/dim HBM — the real constraint)
                  upcast to bf16 in VMEM and scored against UNquantized bf16
                  queries: removes the query-side quantization noise at ~2×
                  MXU cost, which tile pruning's headroom absorbs.
    int8=False  — native bf16/f32 rows.
    """
    if int8 == "hybrid":
        return lax.dot_general(
            q, tile.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if int8:
        return lax.dot_general(
            q, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    return lax.dot_general(
        q, tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tile_second_best(s3, r_iota, r_star, base, l_buckets):
    """Within-tile runner-up per bucket (a DISTINCT row: the winner's row is
    masked before the second reduction). Shared by the top2 variants of the
    tiles kernels (same scheme as ops/pallas_pq.py's _pq_tiles_kernel)."""
    s3b = jnp.where(r_iota == r_star[:, None, :], NEG_INF, s3)
    mx2 = jnp.max(s3b, axis=1)
    is2 = s3b >= mx2[:, None, :]
    r2 = jnp.min(jnp.where(is2, r_iota, s3.shape[1]), axis=1)
    idx2 = base + r2 * l_buckets + lax.broadcasted_iota(
        jnp.int32, mx2.shape, 1)
    return mx2, idx2


def _merge_top2(val_sc, idx_sc, mx, new_idx, mx2, new_idx2):
    """Streaming per-bucket top-2 union merge into slots val_sc[0]/[1]:
    new best = max(run1, tile1); new second = max of the (run1, tile1)
    loser and max(run2, tile2). Duplicate tile replays stay idempotent —
    a row already holding slot 1 is excluded from the slot-2 race by
    index compare."""
    m1, i1 = val_sc[0], idx_sc[0]
    m2, i2 = val_sc[1], idx_sc[1]
    use_t = mx > m1
    dup = jnp.logical_and(jnp.logical_not(use_t), new_idx == i1)
    lo = jnp.where(dup, NEG_INF, jnp.where(use_t, m1, mx))
    lo_i = jnp.where(use_t, i1, new_idx)
    c2 = jnp.maximum(m2, mx2)
    c2_i = jnp.where(mx2 > m2, new_idx2, i2)
    win2 = lo > c2
    val_sc[0] = jnp.where(use_t, mx, m1)
    idx_sc[0] = jnp.where(use_t, new_idx, i1)
    val_sc[1] = jnp.where(win2, lo, c2)
    idx_sc[1] = jnp.where(win2, lo_i, c2_i)


def _band_kernel(
    band_start_ref,  # scalar prefetch: (n_qt,) first arena tile of each band
    nv_ref,  # scalar prefetch: (1,) TRUE row count — pad rows masked out
    q_ref, db_ref, out_v_ref, out_i_ref, val_sc, idx_sc, *, l_buckets, int8
):
    j = pl.program_id(1)  # band-tile step
    n_j = pl.num_programs(1)
    n = nv_ref[0]

    @pl.when(j == 0)
    def _init():
        val_sc[:] = jnp.full_like(val_sc, NEG_INF)
        idx_sc[:] = jnp.zeros_like(idx_sc)

    scores = _score_tile(q_ref[:], db_ref[:], int8)

    tile_sz = scores.shape[1]
    qt = pl.program_id(0)
    at = band_start_ref[qt] + j  # actual arena tile this step loaded
    rows_per_bucket = tile_sz // l_buckets
    base = at * tile_sz
    if rows_per_bucket == 1:
        # L == tile: pure elementwise merge, no reduction/argmax passes
        g = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mx = jnp.where(g < n, scores, NEG_INF)
        new_idx = g
    else:
        s3 = scores.reshape(scores.shape[0], rows_per_bucket, l_buckets)
        g_idx = (
            base
            + lax.broadcasted_iota(jnp.int32, s3.shape, 1) * l_buckets
            + lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        )
        s3 = jnp.where(g_idx < n, s3, NEG_INF)
        mx = jnp.max(s3, axis=1)
        is_max = s3 >= mx[:, None, :]
        r_iota = lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        r_star = jnp.min(jnp.where(is_max, r_iota, rows_per_bucket), axis=1)
        new_idx = base + r_star * l_buckets + lax.broadcasted_iota(jnp.int32, mx.shape, 1)
    better = mx > val_sc[:]
    val_sc[:] = jnp.where(better, mx, val_sc[:])
    idx_sc[:] = jnp.where(better, new_idx, idx_sc[:])

    @pl.when(j == n_j - 1)
    def _emit():
        out_v_ref[:] = val_sc[:]
        out_i_ref[:] = idx_sc[:]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _tiles_kernel(
    tile_table_ref,  # scalar prefetch: (n_qt, P) arena-tile id per grid step
    nv_ref,  # scalar prefetch: (1,) TRUE row count — pad rows masked out
    q_ref, db_ref, out_v_ref, out_i_ref, val_sc, idx_sc, *, l_buckets, int8,
    top2=False,
):
    """Like _band_kernel but each query tile scans an ARBITRARY tile set
    (no contiguity needed — 1-D id locality does not exist in high-dim
    space, so bands degenerate; an explicit table doesn't). top2: best TWO
    distinct rows per bucket (scratch/out gain a leading slot dim of 2)."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    n = nv_ref[0]

    @pl.when(j == 0)
    def _init():
        val_sc[:] = jnp.full_like(val_sc, NEG_INF)
        idx_sc[:] = jnp.zeros_like(idx_sc)

    scores = _score_tile(q_ref[:], db_ref[:], int8)

    tile_sz = scores.shape[1]
    qt = pl.program_id(0)
    at = tile_table_ref[qt, j]
    rows_per_bucket = tile_sz // l_buckets
    base = at * tile_sz
    mx2 = new_idx2 = None
    if rows_per_bucket == 1:
        # L == tile: pure elementwise merge, no reduction/argmax passes
        g = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mx = jnp.where(g < n, scores, NEG_INF)
        new_idx = g
        if top2:
            mx2 = jnp.full_like(mx, NEG_INF)
            new_idx2 = jnp.zeros_like(new_idx)
    else:
        s3 = scores.reshape(scores.shape[0], rows_per_bucket, l_buckets)
        g_idx = (
            base
            + lax.broadcasted_iota(jnp.int32, s3.shape, 1) * l_buckets
            + lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        )
        s3 = jnp.where(g_idx < n, s3, NEG_INF)
        mx = jnp.max(s3, axis=1)
        is_max = s3 >= mx[:, None, :]
        r_iota = lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        r_star = jnp.min(jnp.where(is_max, r_iota, rows_per_bucket), axis=1)
        new_idx = base + r_star * l_buckets + lax.broadcasted_iota(jnp.int32, mx.shape, 1)
        if top2:
            mx2, new_idx2 = _tile_second_best(s3, r_iota, r_star, base,
                                              l_buckets)
    if top2:
        _merge_top2(val_sc, idx_sc, mx, new_idx, mx2, new_idx2)
    else:
        better = mx > val_sc[:]
        val_sc[:] = jnp.where(better, mx, val_sc[:])
        idx_sc[:] = jnp.where(better, new_idx, idx_sc[:])

    @pl.when(j == n_j - 1)
    def _emit():
        out_v_ref[:] = val_sc[:]
        out_i_ref[:] = idx_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_q", "l_buckets", "int8",
                     "interpret", "top2"),
)
def tiles_topk_pallas(
    db,
    queries_sorted,
    tile_table,  # (n_qt, P) i32 arena-tile ids (duplicates/repeats harmless)
    k: int,
    tile_n: int = 2048,
    tile_q: int = 256,
    l_buckets: int = 0,
    int8: bool = False,
    interpret: bool = False,
    n_valid=None,  # true row count (traced scalar ok); pad rows masked out
    top2: bool = False,  # best TWO distinct rows per bucket — candidate
                         # pool 2·l_buckets (see _merge_top2)
):
    """Top-k over per-query-tile selected arena tiles. Same contract as
    band_topk_pallas but driven by an explicit tile table.

    ``n_valid`` is the number of REAL rows in ``db`` (rows ≥ n_valid are
    zero padding to a tile_n multiple and must never become candidates:
    int8 pads score 0, which can outrank real negatives). Defaults to the
    padded size for callers that pre-mask; index-layer callers always pass
    the true count. Traced, so add()-driven count changes don't recompile.
    """
    n, d = db.shape
    nq = queries_sorted.shape[0]
    assert n % tile_n == 0 and nq % tile_q == 0
    if d % 128:
        d_pad = _ceil_to(d, 128)
        db = jnp.zeros((n, d_pad), db.dtype).at[:, :d].set(db)
        queries_sorted = (
            jnp.zeros((nq, d_pad), queries_sorted.dtype).at[:, :d].set(queries_sorted)
        )
        d = d_pad
    if l_buckets == 0:
        l_buckets = tile_n  # R=1: elementwise merge (fastest, biggest pool)
    l_buckets = min(l_buckets, tile_n)
    assert tile_n % l_buckets == 0
    n_qt = nq // tile_q
    p = tile_table.shape[1]
    assert tile_table.shape[0] == n_qt
    nv = jnp.full((1,), n, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_qt, p),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j, tt, nv: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda i, j, tt, nv: (tt[i, j], 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(((2, tile_q, l_buckets) if top2
                          else (tile_q, l_buckets)),
                         (lambda i, j, tt, nv: (0, i, 0)) if top2
                         else (lambda i, j, tt, nv: (i, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((2, tile_q, l_buckets) if top2
                          else (tile_q, l_buckets)),
                         (lambda i, j, tt, nv: (0, i, 0)) if top2
                         else (lambda i, j, tt, nv: (i, 0)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM(((2, tile_q, l_buckets) if top2
                        else (tile_q, l_buckets)), jnp.float32),
            pltpu.VMEM(((2, tile_q, l_buckets) if top2
                        else (tile_q, l_buckets)), jnp.int32),
        ],
    )
    kernel = functools.partial(_tiles_kernel, l_buckets=l_buckets, int8=int8,
                               top2=top2)
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((2, nq, l_buckets) if top2
                                  else (nq, l_buckets)), jnp.float32),
            jax.ShapeDtypeStruct(((2, nq, l_buckets) if top2
                                  else (nq, l_buckets)), jnp.int32),
        ],
        interpret=interpret,
    )(tile_table.astype(jnp.int32), nv, queries_sorted, db)

    if top2:  # slots side by side: (nq, 2·l_buckets) candidates per query
        out_v = jnp.transpose(out_v, (1, 0, 2)).reshape(nq, -1)
        out_i = jnp.transpose(out_i, (1, 0, 2)).reshape(nq, -1)
    top_v, pos = lax.top_k(out_v, min(k, (2 if top2 else 1) * l_buckets))
    top_i = jnp.take_along_axis(out_i, pos, axis=1)
    return top_v, top_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_q", "l_buckets", "band_tiles", "int8", "interpret"),
)
def band_topk_pallas(
    db,
    queries_sorted,
    band_start,  # (n_qt,) i32: first arena tile of each query tile's band
    k: int,
    band_tiles: int,  # static max tiles per band (short bands clamp)
    tile_n: int = 2048,
    tile_q: int = 256,
    l_buckets: int = 0,
    int8: bool = False,
    interpret: bool = False,
    n_valid=None,  # true row count (traced scalar ok); pad rows masked out
):
    """Scores (Q, k) + arena-row ids (Q, k) for pre-sorted, pre-padded inputs.

    db (N_pad, D) with N_pad % tile_n == 0; queries_sorted (Q_pad, D) with
    Q_pad % tile_q == 0 — caller handles sorting/padding (see index layer).
    ``band_start[qt] + band_tiles`` may exceed the arena: caller must clamp
    band_start to n_tiles - band_tiles. ``n_valid``: see tiles_topk_pallas.
    """
    n, d = db.shape
    nq = queries_sorted.shape[0]
    assert n % tile_n == 0 and nq % tile_q == 0
    if d % 128:  # zero-pad the feature axis (IP unchanged); D=768 is a no-op
        d_pad = _ceil_to(d, 128)
        db = jnp.zeros((n, d_pad), db.dtype).at[:, :d].set(db)
        queries_sorted = (
            jnp.zeros((nq, d_pad), queries_sorted.dtype).at[:, :d].set(queries_sorted)
        )
        d = d_pad
    if l_buckets == 0:
        l_buckets = tile_n  # R=1: elementwise merge (fastest, biggest pool)
    l_buckets = min(l_buckets, tile_n)
    assert tile_n % l_buckets == 0
    n_qt = nq // tile_q
    nv = jnp.full((1,), n, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_qt, band_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j, bs, nv: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda i, j, bs, nv: (bs[i] + j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, l_buckets), lambda i, j, bs, nv: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, l_buckets), lambda i, j, bs, nv: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, l_buckets), jnp.float32),
            pltpu.VMEM((tile_q, l_buckets), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _band_kernel, l_buckets=l_buckets, int8=int8
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, l_buckets), jnp.float32),
            jax.ShapeDtypeStruct((nq, l_buckets), jnp.int32),
        ],
        interpret=interpret,
    )(band_start, nv, queries_sorted, db)

    top_v, pos = lax.top_k(out_v, min(k, l_buckets))
    top_i = jnp.take_along_axis(out_i, pos, axis=1)
    return top_v, top_i


def _tiles_resid_kernel(
    tile_table_ref,  # scalar prefetch: (n_qt, P) arena-tile ids
    *refs, l_buckets, w_lists, int8_q, masked=False, l2=False, top2=False,
):
    """Residual-int8 tiles scan: db rows hold int8 RESIDUALS (row − its list
    centroid). Residual norms are a fraction of row norms, so the same 8
    bits carry ~3–4× less quantization noise (measured ceiling at 1M×768:
    0.981 vs 0.956 recall@10 for whole-row int8). The centroid term is
    reconstructed exactly in-kernel — an arena tile spans ≤ w_lists lists,
    local_ref carries each row's local list index:

        scores = (q·C_tile)(Q,W) expanded by one-hot + row_scale · (q · r8ᵀ)

    The CENTROID term always uses unquantized bf16 queries with f32
    accumulation (it carries the ~1.0-scale part of the score). The
    RESIDUAL matmul runs on the int8 MXU path when int8_q (2× the bf16
    rate): query quantization noise lands only on the residual component,
    attenuated by s_resid — ~4× below the db-side residual noise floor.
    row_scale folds s_resid (and the per-row query dequant scale when
    int8_q) so the kernel only multiplies.

    Validity is PER LIST, not a global row count: ve_ref (1, W) carries,
    for each of this tile's lists, the arena row index one past that
    list's last VALID row. Row g of local list li is live iff
    g < ve[li]. This masks (a) tail padding to the tile multiple AND
    (b) interior slack holes that in-place inserts (index layer `add`)
    have not yet filled — a zero residual reconstructs to the list
    centroid, a plausible high-IP phantom if left unmasked.
    """
    rl = list(refs)
    q_ref = rl.pop(0)
    q8_ref = rl.pop(0) if int8_q else None
    db_ref = rl.pop(0)
    local_ref = rl.pop(0)
    mask_ref = rl.pop(0) if masked else None
    ct_ref = rl.pop(0)
    scale_ref = rl.pop(0)
    rs_ref = rl.pop(0) if l2 else None  # (1, 1) GLOBAL residual scale
    ve_ref = rl.pop(0)
    out_v_ref, out_i_ref, val_sc, idx_sc = rl
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        val_sc[:] = jnp.full_like(val_sc, NEG_INF)
        idx_sc[:] = jnp.zeros_like(idx_sc)

    q = q_ref[:]  # (Q, D) bf16
    if int8_q:
        r_scores = lax.dot_general(
            q8_ref[:], db_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        r_scores = lax.dot_general(
            q, db_ref[:].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, T)
    local = local_ref[0, :].astype(jnp.int32)  # (T,)
    qc = lax.dot_general(
        q, ct_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, D)·(W, D)ᵀ → (Q, W), f32 accumulation
    # one-hot gather via MXU matmuls, TWO-PASS bf16-split for near-f32
    # precision: Mosaic's "f32" matmul TRUNCATES operands to one bf16 pass
    # (measured r5: a naive one-hot f32 matmul rounds the ~1.0-scale q·c
    # to bf16, abs err ~4e-3 — headline recall 0.955 → 0.567 at 12.5M).
    # Splitting v = bf16(v) + (v − bf16(v)) makes each pass's products
    # exact (bf16 value × 1.0) and leaves ≤2^-17 relative error — ~100×
    # below the int8 residual noise floor. The old unrolled per-wi VPU
    # loop was exact but materialized W (Q, T) temps — 45 MB of scoped
    # VMEM at the W=129 tile-span cap (r5, measured OOM on anisotropic
    # encoder data); the matmul form is W-scalable.
    w_iota = lax.broadcasted_iota(jnp.int32, (w_lists, local.shape[0]), 0)
    onehot = (w_iota == local[None, :]).astype(jnp.float32)  # (W, T)

    def oh_dot(vals):  # (R, W) f32 → (R, T) single-pass gather matmul
        return lax.dot_general(
            vals, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def oh_gather(vals):  # two-pass split: exact to ~2^-17 relative
        hi = vals.astype(jnp.bfloat16).astype(jnp.float32)
        return oh_dot(hi) + oh_dot(vals - hi)

    c_scores = oh_gather(qc)  # (Q, T)
    scores = c_scores + scale_ref[:] * r_scores
    if l2:
        # L2 ranking key q·x̂ − ‖x̂‖²/2 (argmin ‖q−x̂‖² ≡ argmax of it):
        # the bias derives ENTIRELY from data already in VMEM — x̂ = c + s·r
        # gives ‖x̂‖² = ‖c‖² + 2s·(c·r) + s²‖r‖² with c the row's list
        # centroid and s the GLOBAL residual scale (rs_ref; scale_ref folds
        # the per-QUERY dequant and must not touch the bias). No stored
        # norms → zero mutation-path/persistence plumbing. All terms stay
        # in the (1, T) lane layout via (1, D)·(D, T) matmul reductions —
        # a jnp.sum(axis=1) would land (T,) in sublanes and need a Mosaic
        # relayout to broadcast against (Q, T) scores. Cost: (W+1) skinny
        # matmuls ≈ 13% of the main matmul at W=16, L2 searches only.
        s = rs_ref[0, 0]
        r32 = db_ref[:].astype(jnp.float32)  # int8 exact in f32
        ones = jnp.ones((1, r32.shape[1]), jnp.float32)
        bias = (-0.5 * s * s) * lax.dot_general(
            ones, r32 * r32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, T) = −s²‖r‖²/2
        ct32 = ct_ref[0].astype(jnp.float32)  # (W, D)
        # c_{local[t]}·r_t: one (W, D)·(D, T) matmul + a one-hot row select
        # (W-scalable — the per-wi skinny-matmul loop cost W kernel passes)
        ctr = lax.dot_general(
            ct32, r32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, T)
        sel_cr = jnp.sum(onehot * ctr, axis=0, keepdims=True)  # (1, T)
        ones_d = jnp.ones((1, ct32.shape[1]), jnp.float32)
        cc = lax.dot_general(
            ones_d, ct32 * ct32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, W) = ‖c_w‖²
        cc_row = oh_gather(cc)  # (1, T), two-pass split (bf16-trunc matmul)
        bias = bias - s * sel_cr - 0.5 * cc_row
        scores = scores + bias

    tile_sz = scores.shape[1]
    # per-row valid end: ve of the row's local list, gathered int32-EXACTLY
    # through the bf16-truncating matmul by an 8-BIT RADIX split — each
    # digit ≤ 255 is exact in bf16 (the r5 recall collapse: a 12-bit hi/lo
    # split left hi ≈ 3052 at 12.5M rows, which bf16 rounds to multiples
    # of 16 — valid-end cutoffs shifted ±32k rows). Covers 2^32 rows.
    vei = ve_ref[0, 0, :]  # (W,) i32
    ve_row = jnp.zeros((1, tile_sz), jnp.int32)
    for shift in (24, 16, 8, 0):
        digit = ((vei >> shift) & 0xFF).astype(jnp.float32)[None, :]
        ve_row = ve_row + (oh_dot(digit).astype(jnp.int32) << shift)
    if masked:
        # filtered search: per-row allow bit in arena order (tile_n int8
        # per tile — 0.13% of the payload's HBM traffic). Folded into the
        # EXISTING validity threshold (ve 0 masks the row in the g<ve
        # compare below) — one (T,) i32 multiply, no extra (Q, T) select
        # pass (a scores-level where cost ~20% QPS at the headline op
        # point, measured). int8→i32 widen: v5e Mosaic rejects vector
        # cmpi on i8.
        ve_row = ve_row * mask_ref[:].astype(jnp.int32)  # (1, T)
    qt = pl.program_id(0)
    at = tile_table_ref[qt, j]
    rows_per_bucket = tile_sz // l_buckets
    base = at * tile_sz
    mx2 = new_idx2 = None
    if rows_per_bucket == 1:
        g = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mx = jnp.where(g < ve_row, scores, NEG_INF)  # ve_row (1, T)
        new_idx = g
        if top2:
            mx2 = jnp.full_like(mx, NEG_INF)
            new_idx2 = jnp.zeros_like(new_idx)
    else:
        # per-row cutoff VECTOR (ve_row): compare in the 2-D (Q, T) domain
        # BEFORE the bucket reshape — reshaping the (T,) cutoff to 3-D is a
        # vector shape cast Mosaic rejects for l_buckets > 128 (measured on
        # v5e: (1024,)→(1, 4, 256) fails; the 128-lane minor happened to
        # work, which is all the headline op points ever exercised).
        g2 = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(g2 < ve_row, scores, NEG_INF)  # ve_row (1, T)
        s3 = scores.reshape(scores.shape[0], rows_per_bucket, l_buckets)
        mx = jnp.max(s3, axis=1)
        is_max = s3 >= mx[:, None, :]
        r_iota = lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        r_star = jnp.min(jnp.where(is_max, r_iota, rows_per_bucket), axis=1)
        new_idx = base + r_star * l_buckets + lax.broadcasted_iota(
            jnp.int32, mx.shape, 1)
        if top2:
            mx2, new_idx2 = _tile_second_best(s3, r_iota, r_star, base,
                                              l_buckets)
    if top2:
        _merge_top2(val_sc, idx_sc, mx, new_idx, mx2, new_idx2)
    else:
        better = mx > val_sc[:]
        val_sc[:] = jnp.where(better, mx, val_sc[:])
        idx_sc[:] = jnp.where(better, new_idx, idx_sc[:])

    @pl.when(j == n_j - 1)
    def _emit():
        out_v_ref[:] = val_sc[:]
        out_i_ref[:] = idx_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_q", "l_buckets", "interpret",
                     "int8_q", "l2", "top2"),
)
def tiles_topk_resid_pallas(
    db_resid,        # (N_pad, D) int8 residual rows
    local_ids,       # (1, N_pad) uint8: per-row local list idx within tile
    centroid_tiles,  # (n_tiles, W, D) bf16 per-tile list centroids (D minor:
                     # a W-minor layout pads W→128 lanes in HBM, 21× blowup)
    resid_scale,     # () f32 residual dequant scale
    queries_sorted,  # (Q_pad, D) f32/bf16 pre-sorted queries
    tile_table,      # (n_qt, P) i32
    k: int,
    valid_end,       # (n_tiles, W) i32: one past each tile-list's last VALID
                     # arena row — masks tail padding AND interior slack
                     # holes left for in-place inserts (kernel doc)
    tile_n: int = 2048,
    tile_q: int = 256,
    l_buckets: int = 0,
    interpret: bool = False,
    int8_q: bool = True,  # residual matmul on the int8 MXU path (2× rate)
    row_mask=None,   # (1, N_pad) int8 arena-order allow bits (filtered
                     # search) — None compiles the unmasked kernel
    l2: bool = False,  # L2 metric: in-kernel ranking key q·x̂ − ‖x̂‖²/2
                       # (kernel doc); scores return as the key, callers
                       # convert to −‖q−x̂‖² with their own ‖q‖². Converted
                       # scores carry the quantized path's ABSOLUTE noise
                       # ~(‖q‖+‖x̂‖)·‖x̂‖·2⁻⁸ (bf16 inputs + int8 query
                       # rounding; measured on-chip ≤0.25× that bound) —
                       # ranking-safe, but near-duplicate distances (‖q−x̂‖²
                       # ≈ 0) see it as large RELATIVE error by cancellation
    top2: bool = False,  # best TWO distinct rows per bucket — candidate
                         # pool 2·l_buckets (see _merge_top2)
):
    """Top-k over residual-int8 arena tiles (see _tiles_resid_kernel)."""
    n, d = db_resid.shape
    nq = queries_sorted.shape[0]
    assert n % tile_n == 0 and nq % tile_q == 0
    if d % 128:  # zero-pad the feature axis (IP unchanged); D=768 is a no-op
        d_pad = _ceil_to(d, 128)
        db_resid = jnp.zeros((n, d_pad), db_resid.dtype).at[:, :d].set(db_resid)
        queries_sorted = (
            jnp.zeros((nq, d_pad), queries_sorted.dtype).at[:, :d].set(queries_sorted)
        )
        centroid_tiles = (
            jnp.zeros((centroid_tiles.shape[0], centroid_tiles.shape[1], d_pad),
                      centroid_tiles.dtype).at[:, :, :d].set(centroid_tiles)
        )
        d = d_pad
    if l_buckets == 0:
        l_buckets = tile_n
    l_buckets = min(l_buckets, tile_n)
    assert tile_n % l_buckets == 0
    n_qt = nq // tile_q
    p = tile_table.shape[1]
    w = int(centroid_tiles.shape[1])
    assert valid_end.shape == (centroid_tiles.shape[0], w), (
        valid_end.shape, centroid_tiles.shape)
    qf = queries_sorted.astype(jnp.float32)
    if int8_q:
        q_amax = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-12)
        q8 = jnp.clip(jnp.round(qf * (127.0 / q_amax)), -127, 127).astype(jnp.int8)
        # fold s_resid and the per-row query dequant into one row scale
        row_scale = (q_amax / 127.0) * jnp.asarray(resid_scale, jnp.float32)
    else:
        row_scale = jnp.full((nq, 1), jnp.asarray(resid_scale, jnp.float32))

    q_spec = pl.BlockSpec((tile_q, d), lambda i, j, tt: (i, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [q_spec]
    if int8_q:
        in_specs.append(q_spec)  # q8 rides alongside the bf16 queries
    in_specs += [
        pl.BlockSpec((tile_n, d), lambda i, j, tt: (tt[i, j], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j, tt: (0, tt[i, j]),
                     memory_space=pltpu.VMEM),
    ]
    if row_mask is not None:  # allow bits ride the local_ids layout
        in_specs.append(pl.BlockSpec((1, tile_n), lambda i, j, tt:
                                     (0, tt[i, j]),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((1, w, d), lambda i, j, tt: (tt[i, j], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_q, 1), lambda i, j, tt: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if l2:  # global residual scale (the bias term needs it un-folded)
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j, tt: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [
        pl.BlockSpec((1, 1, w), lambda i, j, tt: (tt[i, j], 0, 0),
                     memory_space=pltpu.VMEM),  # valid_end as (n_tiles,1,W):
        # Mosaic requires the last two block dims to equal the array dims
        # (W is small and never 128-divisible)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_qt, p),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(((2, tile_q, l_buckets) if top2
                          else (tile_q, l_buckets)),
                         (lambda i, j, tt: (0, i, 0)) if top2
                         else (lambda i, j, tt: (i, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((2, tile_q, l_buckets) if top2
                          else (tile_q, l_buckets)),
                         (lambda i, j, tt: (0, i, 0)) if top2
                         else (lambda i, j, tt: (i, 0)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM(((2, tile_q, l_buckets) if top2
                        else (tile_q, l_buckets)), jnp.float32),
            pltpu.VMEM(((2, tile_q, l_buckets) if top2
                        else (tile_q, l_buckets)), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _tiles_resid_kernel, l_buckets=l_buckets, w_lists=w, int8_q=int8_q,
        masked=row_mask is not None, l2=l2, top2=top2,
    )
    args = [tile_table.astype(jnp.int32), qf.astype(jnp.bfloat16)]
    if int8_q:
        args.append(q8)
    args += [db_resid, local_ids]
    if row_mask is not None:
        args.append(row_mask.astype(jnp.int8))
    args += [centroid_tiles.astype(jnp.bfloat16), row_scale]
    if l2:
        args.append(jnp.asarray(resid_scale, jnp.float32).reshape(1, 1))
    args += [valid_end.astype(jnp.int32).reshape(valid_end.shape[0], 1, w)]
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((2, nq, l_buckets) if top2
                                  else (nq, l_buckets)), jnp.float32),
            jax.ShapeDtypeStruct(((2, nq, l_buckets) if top2
                                  else (nq, l_buckets)), jnp.int32),
        ],
        interpret=interpret,
    )(*args)

    if top2:  # slots side by side: (nq, 2·l_buckets) candidates per query
        out_v = jnp.transpose(out_v, (1, 0, 2)).reshape(nq, -1)
        out_i = jnp.transpose(out_i, (1, 0, 2)).reshape(nq, -1)
    top_v, pos = lax.top_k(out_v, min(k, (2 if top2 else 1) * l_buckets))
    top_i = jnp.take_along_axis(out_i, pos, axis=1)
    return top_v, top_i
