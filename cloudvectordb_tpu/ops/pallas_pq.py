"""Fused Pallas PQ scan: on-the-fly decode (one-hot matmuls) + score + top-k.

TPU-first rationale (SURVEY.md §7.3 item 2): TPUs have no fast random gather,
so classic LUT-gather ADC is off the table. Two matmul formulations exist:

  ADC    scores += LUTⱼᵀ·OHⱼᵀ        cost/vec = m·2ᵇ·B      MACs
  decode x̂ᵀ += cbⱼᵀ·OHⱼᵀ ; qᵀ·x̂ᵀ    cost/vec = m·2ᵇ·dsub + D·B

Decode amortizes the codebook work over the whole query batch (B), so for
B ≳ 16 it wins by an order of magnitude — PQ becomes a *memory format* and
scoring stays a plain MXU matmul. The decoded tile lives only in VMEM scratch
(never HBM), so HBM traffic is the m bytes/vec of codes: a 12×–48× bandwidth
saving over raw vectors.

Codes are stored code-major (m, N) uint8 so a (m, T) tile has lane dimension
T (128-aligned); one-hot construction is a VPU compare against an iota.
Top-k uses the same bucketed-max streaming merge as pallas_topk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _pq_scan_kernel(
    q_ref, codes_ref, cbt_ref, out_v_ref, out_i_ref, xhat_sc, val_sc, idx_sc,
    *, n, l_buckets, m, ncode, dsub,
):
    qt = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        val_sc[:] = jnp.full_like(val_sc, NEG_INF)
        idx_sc[:] = jnp.zeros_like(idx_sc)

    tile_sz = codes_ref.shape[1]
    codes = codes_ref[:]  # (m, T) uint8
    # decode: x̂ᵀ (D, T) built per subspace as cbⱼᵀ (dsub, 2ᵇ) @ OHⱼᵀ (2ᵇ, T)
    code_iota = lax.broadcasted_iota(jnp.int32, (ncode, tile_sz), 0)
    for j in range(m):
        oh_t = (code_iota == codes[j, :].astype(jnp.int32)[None, :]).astype(
            jnp.bfloat16
        )  # (2ᵇ, T)
        xhat_sc[j * dsub : (j + 1) * dsub, :] = lax.dot_general(
            cbt_ref[:, j * ncode : (j + 1) * ncode],  # (dsub, 2ᵇ) slice of (dsub, m·2ᵇ)
            oh_t,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # score: q (Q, D) @ x̂ᵀ (D, T) → (Q, T)
    scores = lax.dot_general(
        q_ref[:], xhat_sc[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # bucketed streaming top-k merge (same scheme as pallas_topk)
    rows_per_bucket = tile_sz // l_buckets
    s3 = scores.reshape(scores.shape[0], rows_per_bucket, l_buckets)
    base = t * tile_sz
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

    @pl.when(t == n_t - 1)
    def _emit():
        out_v_ref[:] = val_sc[:]
        out_i_ref[:] = idx_sc[:]


def _ceil_to(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _pq_tiles_kernel(
    tile_table_ref, nv_ref, *refs, l_buckets, m, ncode, dsub, w_lists,
    row_major=False, n_pools=1, n_live_tiles=None, masked=False, l2=False,
    top2=False,
):
    """PQ decode + score over an ARBITRARY per-query-tile tile set — the
    1B-scale path: PQ is the memory format (m bytes/vec in HBM), the tile
    table prunes compute to the lists a query tile actually probes, and the
    decoded bf16 tile lives only in VMEM.

    Residual encoding is exact and cheap: an arena tile spans ≤ w_lists IVF
    lists, so row m of the code block carries each row's LOCAL list index and
    x̂ᵀ += C_tileᵀ (D, W) · OH_localᵀ (W, T) adds the centroid term with one
    skinny matmul (~D·W MACs/row) instead of a per-row gather.

    nv_ref (1,) scalar prefetch: the TRUE row count — pad rows past it are
    masked out (pad codes decode to the code-0 reconstruction + the tile's
    first centroid, a plausible vector that would otherwise become a
    phantom candidate).

    row_major: codes block is (tile_n, m) instead of (m[+1], tile_n) —
    the layout produced by the device-resident build, whose HBM scatter
    aliases only on the ROW axis (axis-1 scatter into a code-major arena
    copies the whole 8 GB arena per chunk at 125M scale). The residual
    local-list byte then rides a SEPARATE (1, N_pad) input: a 65-lane
    minor dim crashes the TPU compiler at ≥8e9 elements (65 vs 64 lanes,
    measured), and 64 keeps the arena exactly m bytes/row.

    n_pools: number of INDEPENDENT bucket pools; probed tile j merges into
    pool j % n_pools. With one pool, a true neighbor is dropped whenever ANY
    other probed tile holds a higher-PQ-scoring row at the same slot position
    (~p_tiles competitors/slot under the R=1 merge) — under noisy PQ scores
    this shadowing caps candidate quality and makes recall plateau in k_cand.
    n_pools pools cut the competitors per slot by n_pools AND multiply the
    candidate budget to n_pools·l_buckets, at zero extra HBM traffic.

    top2: each pool keeps the best TWO distinct rows per bucket (a streaming
    top-2 of the union: new best = max(run1, tile1); new second = max of the
    loser of that pair and max(run2, tile2)). Catches the shadowing mode
    pools cannot — the two best rows of a bucket arriving in the SAME tile
    (pools split tiles, so both compete for one slot). Doubles the candidate
    budget per pool at the same tile traffic; VMEM/merge-VPU cost ×2.
    Duplicate tile replays (plan padding) stay idempotent: a row that
    already holds slot 1 is excluded from the slot-2 race by index compare."""
    mask_ref = None
    if row_major and w_lists and masked:
        (q_ref, codes_ref, local_ref, mask_ref, cbt_ref, ct_ref,
         out_v_ref, out_i_ref, xhat_sc, val_sc, idx_sc) = refs
    elif row_major and w_lists:
        (q_ref, codes_ref, local_ref, cbt_ref, ct_ref,
         out_v_ref, out_i_ref, xhat_sc, val_sc, idx_sc) = refs
    elif masked:
        (q_ref, codes_ref, mask_ref, cbt_ref, ct_ref,
         out_v_ref, out_i_ref, xhat_sc, val_sc, idx_sc) = refs
    else:
        (q_ref, codes_ref, cbt_ref, ct_ref,
         out_v_ref, out_i_ref, xhat_sc, val_sc, idx_sc) = refs
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    n = nv_ref[0]
    qt = pl.program_id(0)
    at = tile_table_ref[qt, j]

    @pl.when(j == 0)
    def _init():
        val_sc[:] = jnp.full_like(val_sc, NEG_INF)
        idx_sc[:] = jnp.zeros_like(idx_sc)

    # segmented dispatch: out-of-segment table entries point at the pad
    # tile (index n_live_tiles) — skip the whole decode+score for them
    # (the block DMA still runs, but it is one cached zero tile)
    live = (at < n_live_tiles) if n_live_tiles is not None else (j >= 0)

    @pl.when(live)
    def _body():
        # codes block is ALWAYS (rows, tile_n) code-major in VMEM: the
        # row-major (N_pad, m) arena is passed TRANSPOSED by the wrapper —
        # a zero-copy bitcast of its compact {0,1} HBM layout. Feeding
        # (tile_n, m) blocks instead forces XLA to relayout every segment
        # row-major-padded (64→128 lanes) before the custom call: 1.88 GB
        # of HLO temps PER SEGMENT at 125M rows/chip (measured — the
        # config-#5 serving OOM), plus the copy traffic per search.
        codes = codes_ref[:]
        tile_sz = codes.shape[1]

        def code_row(sub):
            return codes[sub, :]

        code_iota = lax.broadcasted_iota(jnp.int32, (ncode, tile_sz), 0)
        for sub in range(m):
            oh_t = (code_iota == code_row(sub).astype(jnp.int32)[None, :]).astype(
                jnp.bfloat16
            )
            xhat_sc[sub * dsub : (sub + 1) * dsub, :] = lax.dot_general(
                cbt_ref[:, sub * ncode : (sub + 1) * ncode], oh_t,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        if w_lists:  # residual mode: add this tile's per-row centroid term
            local = (local_ref[0, :] if row_major else code_row(m)).astype(
                jnp.int32
            )  # (T,) local list idx < w_lists
            w_iota = lax.broadcasted_iota(jnp.int32, (w_lists, tile_sz), 0)
            oh_l = (w_iota == local[None, :]).astype(jnp.bfloat16)  # (W, T)
            xhat_sc[:, :] = xhat_sc[:, :] + lax.dot_general(
                ct_ref[0], oh_l, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # ct (W, D) contracted on W with OH (W, T) → (D, T)
        scores = lax.dot_general(
            q_ref[:], xhat_sc[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l2:
            # L2 ranking key q·x̂ − ‖x̂‖²/2: the decoded reconstruction
            # already sits in the (D, T) f32 scratch, so the bias is one
            # (1, D)·(D, T) ones-matmul reduction — lane layout, no stored
            # norms, no extra HBM traffic. Pad rows decode to a plausible
            # vector either way and stay masked by the validity cutoff.
            ones = jnp.ones((1, xhat_sc.shape[0]), jnp.float32)
            x2 = xhat_sc[:, :]
            scores = scores - 0.5 * lax.dot_general(
                ones, x2 * x2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, T) broadcasts over (Q, T)
        rows_per_bucket = tile_sz // l_buckets
        base = at * tile_sz
        if masked:
            # filtered search: per-row allow bit (arena order) folded into
            # the EXISTING validity threshold — each row's cutoff becomes
            # allow·n, so disallowed rows fail the g<cutoff compare below
            # with no extra (Q, T) select pass (i32 widen: v5e Mosaic
            # rejects vector cmpi on i8)
            n_row = mask_ref[0, :].astype(jnp.int32) * n
        if rows_per_bucket == 1:
            # L == tile: pure elementwise merge, no reduction/argmax passes
            g = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            mx = jnp.where(g < (n_row[None, :] if masked else n),
                           scores, NEG_INF)
            new_idx = g
        else:
            if masked:
                # per-row cutoff VECTOR: compare in the 2-D (Q, T) domain
                # BEFORE the bucket reshape — reshaping the (T,) cutoff to
                # 3-D is a vector shape cast Mosaic rejects for
                # l_buckets > 128 ("infer-vector-layout: unsupported shape
                # cast", measured on v5e at (1024,)→(1, 4, 256)); same
                # element count either way.
                g2 = base + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = jnp.where(g2 < n_row[None, :], scores, NEG_INF)
            s3 = scores.reshape(scores.shape[0], rows_per_bucket, l_buckets)
            if not masked:
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
            # within-tile runner-up per bucket (a DISTINCT row: the winning
            # row is masked out before the second reduction)
            if rows_per_bucket == 1:
                mx2 = jnp.full_like(mx, NEG_INF)
                new_idx2 = jnp.zeros_like(new_idx)
            else:
                s3b = jnp.where(r_iota == r_star[:, None, :], NEG_INF, s3)
                mx2 = jnp.max(s3b, axis=1)
                is2 = s3b >= mx2[:, None, :]
                r2 = jnp.min(jnp.where(is2, r_iota, rows_per_bucket), axis=1)
                new_idx2 = base + r2 * l_buckets + lax.broadcasted_iota(
                    jnp.int32, mx2.shape, 1)

        def merge_into(pid):
            if not top2:
                better = mx > val_sc[pid]
                val_sc[pid] = jnp.where(better, mx, val_sc[pid])
                idx_sc[pid] = jnp.where(better, new_idx, idx_sc[pid])
                return
            s1, s2 = 2 * pid, 2 * pid + 1
            m1, i1 = val_sc[s1], idx_sc[s1]
            m2, i2 = val_sc[s2], idx_sc[s2]
            use_t = mx > m1
            b1 = jnp.where(use_t, mx, m1)
            j1 = jnp.where(use_t, new_idx, i1)
            # loser of (run1, tile1) competes for slot 2 — unless it IS the
            # slot-1 row re-presented by a duplicate tile replay
            dup = jnp.logical_and(jnp.logical_not(use_t), new_idx == i1)
            lo = jnp.where(dup, NEG_INF, jnp.where(use_t, m1, mx))
            lo_i = jnp.where(use_t, i1, new_idx)
            c2 = jnp.maximum(m2, mx2)
            c2_i = jnp.where(mx2 > m2, new_idx2, i2)
            win2 = lo > c2
            val_sc[s1] = b1
            idx_sc[s1] = j1
            val_sc[s2] = jnp.where(win2, lo, c2)
            idx_sc[s2] = jnp.where(win2, lo_i, c2_i)

        if n_pools == 1:
            merge_into(0)
        else:
            # predicated static-index update: pool j % n_pools takes this tile
            pool = lax.rem(j, n_pools)
            for pid in range(n_pools):
                @pl.when(pool == pid)
                def _upd(pid=pid):
                    merge_into(pid)

    @pl.when(j == n_j - 1)
    def _emit():
        out_v_ref[:] = val_sc[:]
        out_i_ref[:] = idx_sc[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_q", "l_buckets", "interpret",
                     "row_major", "n_pools", "n_live_tiles", "l2", "top2"),
)
def pq_tiles_topk_pallas(
    codes_cm,
    codebooks,
    queries_sorted,
    tile_table,
    k: int,
    centroid_tiles=None,
    tile_n: int = 1024,
    tile_q: int = 128,
    l_buckets: int = 0,
    interpret: bool = False,
    n_valid=None,  # true row count (traced scalar ok); pad rows masked out
    row_major: bool = False,  # codes are (N_pad, m) — see kernel doc
    local_ids=None,  # (1, N_pad) uint8, required when row_major + residual
    n_pools: int = 1,  # independent bucket pools (see kernel doc); VMEM cost
                       # is 16·tile_q·l_buckets·n_pools bytes — keep
                       # n_pools·l_buckets ≲ 4096 at tile_q=128
    n_live_tiles: int | None = None,  # segmented dispatch: tiles ≥ this are
                                      # the pad tile — skip their compute
    row_mask=None,  # (1, N_pad) int8 arena-order allow bits (filtered
                    # search) — None compiles the unmasked kernel; a tuple
                    # parallels segmented codes_cm
    l2: bool = False,  # L2 metric: kernel ranks by q·x̂ − ‖x̂‖²/2 (see
                       # _pq_tiles_kernel); callers convert to −‖q−x̂‖²
    top2: bool = False,  # best TWO distinct rows per bucket per pool (see
                         # kernel doc) — candidate budget 2·n_pools·l_buckets
):
    """Tile-table-pruned PQ search (IP on reconstructions).

    codes_cm (m[+1], N_pad) uint8 code-major with N_pad % tile_n == 0 — the
    extra row (residual mode) is each row's LOCAL list index within its tile;
    row_major=True flips to (N_pad, m[+1]) (the device-resident-build layout).
    centroid_tiles (n_tiles, W, D) bf16 holds each tile's ≤W list centroids
    (D minor: a W-minor layout pads W→128 lanes in HBM, 21× blowup).
    queries_sorted (Q_pad, D) pre-sorted/padded; tile_table (n_qt, P) i32.
    ``n_valid``: number of REAL rows (pad rows must never become candidates —
    they decode to plausible vectors); defaults to the padded size.
    Returns (scores (Q, k) f32, arena-row idx (Q, k) i32).

    SEGMENTED arenas: `codes_cm` may be a tuple of row-major segments —
    required past ~33M rows, where Mosaic's DMA descriptors overflow on a
    64-lane int8 input (measured: 30M×64 OK, 67M×64 fails compile; the
    768-lane residual arena is fine at 12.5M×768 = 9.6 GB). Each segment
    carries a trailing ZERO pad tile; this wrapper remaps out-of-segment
    tile-table entries to that pad tile (masked via the per-segment
    n_valid), dispatches the unchanged kernel per segment, and merges the
    candidate pools with global row offsets. `centroid_tiles`, `local_ids`
    and `n_valid` must then be parallel tuples.
    """
    if isinstance(codes_cm, (list, tuple)):
        assert row_major, "segmentation is a row-major-arena feature"
        outs_v, outs_i = [], []
        t_off = 0
        for si, seg in enumerate(codes_cm):
            seg_tiles = seg.shape[0] // tile_n - 1  # minus the pad tile
            in_seg = (tile_table >= t_off) & (tile_table < t_off + seg_tiles)
            tt_seg = jnp.where(in_seg, tile_table - t_off, seg_tiles)
            v, i = pq_tiles_topk_pallas(
                seg, codebooks, queries_sorted, tt_seg.astype(jnp.int32), k,
                centroid_tiles=(centroid_tiles[si]
                                if centroid_tiles is not None else None),
                tile_n=tile_n, tile_q=tile_q, l_buckets=l_buckets,
                interpret=interpret, n_valid=n_valid[si], row_major=True,
                local_ids=(local_ids[si] if local_ids is not None else None),
                n_pools=n_pools, n_live_tiles=seg_tiles,
                row_mask=(row_mask[si] if row_mask is not None else None),
                l2=l2, top2=top2,
            )
            outs_v.append(v)
            outs_i.append(i + t_off * tile_n)
            t_off += seg_tiles
        cand_v = jnp.concatenate(outs_v, axis=1)
        cand_i = jnp.concatenate(outs_i, axis=1)
        top_v, pos = lax.top_k(cand_v, min(k, cand_v.shape[1]))
        return top_v, jnp.take_along_axis(cand_i, pos, axis=1)

    ncode, dsub = codebooks.shape[1], codebooks.shape[2]
    residual = centroid_tiles is not None
    if row_major:
        m = codes_cm.shape[1]  # the local byte is a separate input
        n = codes_cm.shape[0]
        assert not residual or local_ids is not None
    else:
        m = codes_cm.shape[0] - (1 if residual else 0)
        n = codes_cm.shape[1]
    d = m * dsub
    nq = queries_sorted.shape[0]
    assert n % tile_n == 0 and nq % tile_q == 0
    if l_buckets == 0:
        l_buckets = tile_n  # R=1: elementwise merge (fastest, biggest pool)
    l_buckets = min(l_buckets, tile_n)
    assert tile_n % l_buckets == 0
    n_slots = n_pools * (2 if top2 else 1)  # scratch/output pool rows
    n_qt = nq // tile_q
    p = tile_table.shape[1]
    w_lists = int(centroid_tiles.shape[1]) if residual else 0

    qp = queries_sorted.astype(jnp.bfloat16)
    cbt = jnp.transpose(codebooks, (2, 0, 1)).reshape(dsub, m * ncode).astype(
        jnp.bfloat16
    )
    if not residual:
        centroid_tiles = jnp.zeros((1, 1, d), jnp.bfloat16)
    code_rows = m + (1 if residual else 0)
    nv = jnp.full((1,), n, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1)
    )
    # codes always dispatch as code-major (rows, tile_n) blocks; row-major
    # arenas are transposed below (bitcast — see kernel doc on layouts)
    codes_spec = pl.BlockSpec(
        ((m if row_major else code_rows), tile_n),
        lambda i, j, tt, nv: (0, tt[i, j]), memory_space=pltpu.VMEM)
    in_specs_head = [
        pl.BlockSpec((tile_q, d), lambda i, j, tt, nv: (i, 0),
                     memory_space=pltpu.VMEM),
        codes_spec,
    ]
    if row_major and residual:
        in_specs_head.append(
            pl.BlockSpec((1, tile_n), lambda i, j, tt, nv: (0, tt[i, j]),
                         memory_space=pltpu.VMEM))
    if row_mask is not None:  # allow bits ride the local-ids layout
        in_specs_head.append(
            pl.BlockSpec((1, tile_n), lambda i, j, tt, nv: (0, tt[i, j]),
                         memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_qt, p),
        in_specs=[
            *in_specs_head,
            pl.BlockSpec(
                (dsub, m * ncode), lambda i, j, tt, nv: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, centroid_tiles.shape[1], centroid_tiles.shape[2]),
                (lambda i, j, tt, nv: (tt[i, j], 0, 0)) if residual
                else (lambda i, j, tt, nv: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),  # (1, W, D)
        ],
        out_specs=[
            pl.BlockSpec((n_slots, tile_q, l_buckets),
                         lambda i, j, tt, nv: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_slots, tile_q, l_buckets),
                         lambda i, j, tt, nv: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, tile_n), jnp.float32),
            pltpu.VMEM((n_slots, tile_q, l_buckets), jnp.float32),
            pltpu.VMEM((n_slots, tile_q, l_buckets), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _pq_tiles_kernel, l_buckets=l_buckets, m=m, ncode=ncode, dsub=dsub,
        w_lists=w_lists, row_major=row_major, n_pools=n_pools,
        n_live_tiles=n_live_tiles, masked=row_mask is not None, l2=l2,
        top2=top2,
    )
    args = [tile_table.astype(jnp.int32), nv, qp,
            codes_cm.T if row_major else codes_cm]
    if row_major and residual:
        args.append(local_ids)
    if row_mask is not None:
        args.append(row_mask.astype(jnp.int8))
    args += [cbt, centroid_tiles.astype(jnp.bfloat16)]
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, nq, l_buckets), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, nq, l_buckets), jnp.int32),
        ],
        interpret=interpret,
        # deep-pool configs (n_pools·l_buckets·tile_q slots + the (d, tile_n)
        # decode scratch) exceed XLA's 16 MB default scoped-vmem budget by
        # ~1 MB at tile_q=128/l_buckets=512/n_pools=2 (measured: 17.16 MB,
        # config #5 two-stage). v5e has 128 MB VMEM/core — raise the kernel
        # budget instead of shrinking the op point.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*args)

    # pools side by side: (nq, n_slots·l_buckets) candidate slots per query
    cand_v = jnp.transpose(out_v[:, :nq], (1, 0, 2)).reshape(nq, -1)
    cand_i = jnp.transpose(out_i[:, :nq], (1, 0, 2)).reshape(nq, -1)
    top_v, pos = lax.top_k(cand_v, min(k, n_slots * l_buckets))
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_v, top_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "tile_q", "l_buckets", "interpret"),
)
def pq_topk_pallas(
    codes_cm,
    codebooks,
    queries,
    k: int,
    tile_n: int = 2048,
    tile_q: int = 128,
    l_buckets: int = 0,
    interpret: bool = False,
):
    """Top-k inner-product search over PQ codes (non-residual, IP metric).

    codes_cm  (m, N) uint8 — code-major layout (see ivf_pq arena export)
    codebooks (m, 2ᵇ, dsub) f32
    queries   (Q, D) — D = m·dsub
    Returns (scores (Q, k) f32 vs reconstructions, idx (Q, k) i32).
    """
    m, n = codes_cm.shape
    ncode, dsub = codebooks.shape[1], codebooks.shape[2]
    d = m * dsub
    nq, dq = queries.shape
    assert dq == d, (dq, d)
    k = min(k, n)
    if l_buckets == 0:
        l_buckets = tile_n  # R=1: elementwise merge (fastest, biggest pool)
    l_buckets = min(l_buckets, tile_n)
    assert tile_n % l_buckets == 0

    n_pad = _ceil_to(n, tile_n)
    q_pad = _ceil_to(nq, tile_q)
    codes_p = jnp.zeros((m, n_pad), jnp.uint8).at[:, :n].set(codes_cm)
    qp = (
        jnp.zeros((q_pad, d), jnp.bfloat16)
        .at[:nq, :]
        .set(queries.astype(jnp.bfloat16))
    )
    # codebooks transposed + flattened: (dsub, m·2ᵇ), bf16 for the MXU
    cbt = jnp.transpose(codebooks, (2, 0, 1)).reshape(dsub, m * ncode).astype(
        jnp.bfloat16
    )

    grid = (q_pad // tile_q, n_pad // tile_n)
    kernel = functools.partial(
        _pq_scan_kernel, n=n, l_buckets=l_buckets, m=m, ncode=ncode, dsub=dsub
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dsub, m * ncode), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
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
            pltpu.VMEM((d, tile_n), jnp.float32),  # decoded x̂ᵀ tile
            pltpu.VMEM((tile_q, l_buckets), jnp.float32),
            pltpu.VMEM((tile_q, l_buckets), jnp.int32),
        ],
        interpret=interpret,
    )(qp, codes_p, cbt)

    cand_v = out_v[:nq]
    cand_i = out_i[:nq]
    top_v, pos = lax.top_k(cand_v, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_v, top_i
