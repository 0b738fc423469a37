"""Config #3 (10M×768 OPQ+IVF-PQ) build + the <1 h full-build budget rehearsal.

Usage: python scripts/bench_build_budget.py [N_millions=10] [p_tiles=...]

Times every stage of "full build from raw text" (BASELINE.json:5) at the
largest size one chip holds, then extrapolates per-chip to v5e-8/100M with
stated assumptions:

  1. encode   — MiniLM-L6-class forward throughput probe (B=512, L=128);
                the real pipeline streams tokenize(host) → encode(device) →
                insert(device), so encode time ≈ rows / throughput.
  2. train    — OPQ rotation + coarse k-means (nlist) + PQ codebooks on a
                262k sample (one-time, does not scale with N).
  3. populate — assign + rotate + residual-PQ-encode + int8-refine-quantize
                + scatter, all device-resident (build_device_streaming).
  4. eval     — exact GT on 512 queries; recall@10 + fenced QPS sweep.

Extrapolation: stages 1 and 3 scale linearly in rows/chip and run 8-way
parallel on a pod slice (row-partitioned shards, no cross-chip traffic
except the tiny shared quantizers); stage 2 is constant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp

D, K, B, LATENT, NCENTERS = 768, 10, 4096, 32, 256
CHUNK = int(os.environ.get("BENCH_CHUNK", 500_000))
NQ_GT = 512


def encode_probe():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.models.encoder import init_encoder
    from cloudvectordb_tpu.utils.config import EncoderConfig

    cfg = EncoderConfig(max_len=128)
    model, params = init_encoder(cfg, seed=0)
    bs = 512
    fwd = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m, True))

    @jax.jit
    def mkbatch(key):
        ids = jax.random.randint(key, (bs, cfg.max_len), 0, cfg.vocab_size)
        return ids, jnp.ones_like(ids)

    batches = [mkbatch(jax.random.PRNGKey(i)) for i in range(8)]
    float(jnp.sum(fwd(params, *batches[0])))
    rtt = measure_fetch_rtt()
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(6):
        acc = acc + jnp.sum(fwd(params, *batches[i % 8]))
    float(acc)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    return bs * 6 / dt


def main():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.index.ivf_band import (
        BandIVFPQIndex, _pq_tiles_plan_search, _tiles_resid_plan_search)
    from cloudvectordb_tpu.ops.topk import tiled_topk

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(n_m * 1e6)
    n_chunks = -(-n // CHUNK)
    sizes = [CHUNK] * (n // CHUNK) + ([n % CHUNK] if n % CHUNK else [])
    nlist = int(os.environ.get("BENCH_NLIST", 4096))
    aniso_eta = float(os.environ.get("ANISO_ETA", "0"))
    print(f"config#3: N={n} D={D} m=64 nbits=8 OPQ refine=int8 nlist={nlist}",
          flush=True)

    # --- stage 1: encode probe ---------------------------------------------
    enc_ps = encode_probe()
    t_encode = n / enc_ps
    print(f"[encode] {enc_ps:,.0f} passages/s/chip → {n/1e6:.0f}M rows "
          f"= {t_encode/60:.1f} min/chip", flush=True)

    kw, kc = jax.random.split(jax.random.PRNGKey(1000))
    w = jax.random.normal(kw, (LATENT, D), jnp.float32) / (LATENT ** 0.5)
    centers = jax.random.normal(kc, (NCENTERS, LATENT), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen(key, m):
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (m,), 0, NCENTERS)
        z = centers[a] + (0.3 / (LATENT ** 0.5)) * jax.random.normal(
            kn, (m, LATENT), jnp.float32)
        x = z @ w
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    def chunk_fn(i):
        return gen(jax.random.PRNGKey(i), sizes[i])

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_queries(key, m):
        kq, kn = jax.random.split(key)
        base = gen(jax.random.PRNGKey(0), sizes[0])
        sel = jax.random.randint(kq, (m,), 0, sizes[0])
        q = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
            kn, (m, D), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    queries = gen_queries(jax.random.PRNGKey(7777), B)
    q_raw = np.asarray(queries)  # pre-rotation copy (idx.search rotates)
    q_gt = queries[:NQ_GT]

    # --- exact ground truth (top-128: rows 10.. feed the refine-ceiling
    # decomposition — a perfect candidate set for the int8 rescore) --------
    K_CEIL = 128
    t0 = time.perf_counter()
    best_v = jnp.full((NQ_GT, K_CEIL), -jnp.inf)
    best_i = jnp.zeros((NQ_GT, K_CEIL), jnp.int32)

    @jax.jit
    def gt_merge(bv, bi, cv, ci, base):
        av = jnp.concatenate([bv, cv], axis=1)
        ai = jnp.concatenate([bi, ci + base], axis=1)
        v, p = jax.lax.top_k(av, K_CEIL)
        return v, jnp.take_along_axis(ai, p, axis=1)

    for ci in range(n_chunks):
        cv, cidx = tiled_topk(chunk_fn(ci), q_gt, K_CEIL, tile=8192)
        best_v, best_i = gt_merge(best_v, best_i, cv, cidx, ci * CHUNK)
    gt128 = jax.device_get(best_i)
    gt = gt128[:, :K]
    print(f"[gt] {time.perf_counter() - t0:.0f} s (not part of the build)",
          flush=True)

    # --- stages 2+3: quantizer training + device-resident populate ----------
    t0 = time.perf_counter()
    idx = BandIVFPQIndex.build_device_streaming(
        chunk_fn, n_chunks, nlist=nlist, m=64, nbits=8, opq=True,
        refine="int8", kmeans_iters=10, pq_train_iters=8,
        aniso_eta=aniso_eta,
    )
    t_build = time.perf_counter() - t0
    n_tiles = idx._n_pad_rows // idx.tile_n
    print(f"[train+populate] {t_build:.0f} s (incl. OPQ+kmeans+PQ on 262k "
          f"sample + {n_chunks} chunk encode/scatter passes)", flush=True)

    # --- stage 4: recall + fenced QPS ----------------------------------------
    # configs: p_tiles:k_cand:n_pools:tile_q (0 p_tiles = span-aware auto).
    # Defaults exercise the r2 findings: span-aware p + single pool, then
    # deep 4×1024-slot pools at tile_q=64 (slot-max shadowing recovery).
    st = idx._device_state()
    rtt = measure_fetch_rtt()
    nv = jnp.asarray(idx._n, jnp.int32)
    # the index lives in OPQ-ROTATED space: rotate queries before planning/
    # scoring, exactly as BandIVFPQIndex.search does. (r2 ran this eval on
    # UNrotated queries — every r2 config-#3 recall number was depressed by
    # scoring raw queries against a rotated index.)
    if idx.opq_matrix is not None:
        queries = queries @ jnp.asarray(idx.opq_matrix).T
    # --- serve_from='refine' (r3): residual-int8 scan of the refine arena —
    # the regime-correct serving mode at ≤ ~16M rows/chip: no PQ candidate
    # ceiling, no per-candidate gather (see BandIVFPQIndex.search doc) ------
    for cfg_s in os.environ.get("RF_CFGS", "0:64,512:64,768:64").split(","):
        p_rf, tq_rf = [int(x) for x in cfg_s.split(":")]
        p_eff = min(p_rf, n_tiles) if p_rf else 0
        try:
            _, f_rf = idx.search(q_raw, K, p_tiles=p_eff, tile_q=tq_rf,
                                 serve_from="refine")
            r_rf = recall_at_k(f_rf[:NQ_GT], gt)
            reps = 8
            t0 = time.perf_counter()
            for it in range(reps):  # np outputs fence each call
                idx.search(np.roll(q_raw, it + 1, axis=0), K, p_tiles=p_eff,
                           tile_q=tq_rf, serve_from="refine")
            raw_t = (time.perf_counter() - t0) / reps
            dt = raw_t if raw_t - rtt < 0.05 * raw_t else raw_t - rtt
            # end-to-end through this dev relay ships the 12.6 MB query
            # batch at the measured ~23 MB/s each call (~0.55 s — a 0.8 ms
            # PCIe copy on real hardware), so the np.asarray path above is
            # link-bound here. DEVICE qps below keeps queries resident
            # (identical math to the search() dispatch) — the same
            # methodology as bench.py's headline.
            st_rf = idx._refine_scan_state()
            tq_d = tq_rf
            p_dev = p_eff or idx._auto_p_tiles(B, 32, n_tiles, tile_q=tq_d)
            qdev = jnp.asarray(queries)  # already rotated

            def run_rf(noise):
                return _tiles_resid_plan_search(
                    qdev + noise, st_rf["centroids"], st_rf["refine"],
                    st_rf["refine_local"], st_rf["centroid_tiles"],
                    idx._scale, st_rf["ids"], st_rf["tile_window"],
                    st_rf["refine_valid_end"], k=K, p_tiles=p_dev,
                    tile_n=idx.tile_n, tile_q=tq_d, interpret=False)

            vd, gd = run_rf(0.0)
            r_dev = recall_at_k(jax.device_get(gd)[:NQ_GT], gt)
            acc = jnp.float32(0)
            for it in range(2):  # warm both executables
                vv, _ = run_rf(0.5 + 1e-4 * it)
                acc = acc + jnp.sum(vv)
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for it in range(reps):
                vv, _ = run_rf(1e-4 * (it + 1))
                acc = acc + jnp.sum(vv)
            float(acc)
            dt_d = max(time.perf_counter() - t0 - rtt, 1e-9)
            print(f"[refine-scan] p={p_dev} ({p_dev/n_tiles:5.1%}) "
                  f"tq={tq_rf}: recall@10={r_rf:.4f} (device-path "
                  f"{r_dev:.4f})  device {B*reps/dt_d:9.0f} qps/chip  "
                  f"(end-to-end via relay {B/dt:7.0f}, link-bound)",
                  flush=True)
        except Exception as e:
            print(f"[refine-scan] {cfg_s}: FAILED {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)

    # --- decomposition: where does the PQ+gather path lose recall? ---------
    # (1) refine ceiling: int8-residual rescore of PERFECT (exact top-128)
    #     candidates — the best any candidate generator could achieve;
    # (2) PQ candidate recall@k_cand — how much of gt@10 the PQ stage keeps;
    # (3) PQ-only ranking (no refine) for reference.
    try:
        ids_np = np.asarray(idx._ids, np.int64)
        inv = np.empty(n, np.int64)
        inv[ids_np[: idx._n]] = np.arange(idx._n)
        rows128 = inv[gt128]  # (NQ_GT, 128) arena rows of exact candidates
        assign128 = (np.searchsorted(idx._offsets, rows128, side="right")
                     - 1).astype(np.int32)
        qr = queries[:NQ_GT]  # rotated
        st2 = idx._device_state()

        # refine/centroids ride as ARGUMENTS: closing over the 7.5 GB
        # device array inlines it as an MLIR constant — the remote-compile
        # tunnel then ships the whole arena to the compiler (observed hang)
        @jax.jit
        def ceil_rescore(refine_d, cent_d, qrj, rows_d, assign_d):
            r8 = refine_d[rows_d].astype(jnp.float32) * idx._scale
            dots = qrj @ cent_d.T  # (nq, nlist)
            ex = (jnp.einsum("bd,brd->br", qrj, r8)
                  + jnp.take_along_axis(dots, assign_d, axis=1))
            _, pos = jax.lax.top_k(ex, K)
            return pos

        pos = jax.device_get(ceil_rescore(
            st2["refine"], st2["centroids"],
            qr, jnp.asarray(rows128.astype(np.int32)),
            jnp.asarray(assign128)))
        ceil_ids = np.take_along_axis(gt128, pos, axis=1)
        print(f"[decomp] refine ceiling (int8 rescore of exact top-128): "
              f"recall@10={recall_at_k(ceil_ids, gt):.4f}", flush=True)

        # top2 rows: per-bucket top-2 merge — the same k_cand from half the
        # bucket slots (ops/pallas_pq.py kernel doc)
        for k_cand, n_pools, tqd, top2 in (
                (1024, 1, 128, False), (4096, 4, 64, False),
                (1024, 1, 128, True), (4096, 4, 64, True)):
            mult = 2 if top2 else 1
            lb = idx._derive_l_buckets(k_cand, mult * n_pools)
            kc = min(k_cand, mult * n_pools * lb)
            p_d = idx._auto_p_tiles(B, 32, n_tiles, tile_q=tqd)
            v, g = _pq_tiles_plan_search(
                queries, st["centroids"], st["codes"], st["codebooks"],
                st["refine"], st["ids"], st["tile_window"],
                st["centroid_tiles"], nv, st.get("local_rm"),
                k=kc, k_cand=kc, p_tiles=p_d, tile_n=idx.tile_n, tile_q=tqd,
                interpret=False, refine_scale=0.0,  # raw candidates
                row_major=idx._codes_row_major, n_pools=n_pools,
                l_buckets=lb, refine_residual=False, top2=top2,
            )
            cand = jax.device_get(g)[:NQ_GT]
            hit = np.zeros(gt.shape, bool)
            for b_ in range(NQ_GT):
                hit[b_] = np.isin(gt[b_], cand[b_])
            print(f"[decomp] PQ candidate recall@{kc} (pools={n_pools} "
                  f"tq={tqd} p={p_d} top2={int(top2)}): {hit.mean():.4f}",
                  flush=True)

        v10, g10 = _pq_tiles_plan_search(
            queries, st["centroids"], st["codes"], st["codebooks"],
            st["refine"], st["ids"], st["tile_window"], st["centroid_tiles"],
            nv, st.get("local_rm"),
            k=K, k_cand=K, p_tiles=idx._auto_p_tiles(B, 32, n_tiles,
                                                     tile_q=64),
            tile_n=idx.tile_n, tile_q=64, interpret=False, refine_scale=0.0,
            row_major=idx._codes_row_major, n_pools=1,
            l_buckets=idx._derive_l_buckets(K, 1), refine_residual=False,
        )
        print(f"[decomp] PQ-only ranking: "
              f"recall@10={recall_at_k(jax.device_get(g10)[:NQ_GT], gt):.4f}",
              flush=True)
    except Exception as e:
        print(f"[decomp] FAILED {type(e).__name__} {str(e)[:200]}", flush=True)

    cfg_list = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["0:1024:1:128", "0:4096:4:64", "512:4096:4:64"])
    for cfg_s in cfg_list:
        parts = [int(x) for x in cfg_s.split(":")]
        # p:k_cand:pools:tile_q[:top2] — top2=1 enables the per-bucket
        # top-2 merge (same pools → same k_cand from half the buckets)
        p_tiles, k_cand, n_pools, tile_q, top2_i = (
            parts + [1, idx.tile_q, 0])[:5]
        top2 = bool(top2_i)
        p_tiles = min(p_tiles, n_tiles) if p_tiles else idx._auto_p_tiles(
            B, 32, n_tiles, tile_q=tile_q)
        mult = 2 if top2 else 1
        l_buckets = idx._derive_l_buckets(k_cand, mult * n_pools)

        def run(noise):
            return _pq_tiles_plan_search(
                queries + noise, st["centroids"], st["codes"],
                st["codebooks"], st["refine"], st["ids"], st["tile_window"],
                st["centroid_tiles"], nv, st.get("local_rm"),
                k=K, k_cand=min(k_cand, mult * n_pools * l_buckets),
                p_tiles=p_tiles, tile_n=idx.tile_n,
                tile_q=tile_q, interpret=False, refine_scale=idx._scale,
                row_major=idx._codes_row_major,
                refine_residual=idx._refine_residual,
                n_pools=n_pools, l_buckets=l_buckets, top2=top2,
            )

        try:
            v, g = run(0.0)
            r = recall_at_k(jax.device_get(g)[:NQ_GT], gt)
            reps = 8
            acc = jnp.float32(0)
            for it in range(2):
                vv, _ = run(0.5 + 1e-4 * it)
                acc = acc + jnp.sum(vv)
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for it in range(reps):
                vv, _ = run(1e-4 * (it + 1))
                acc = acc + jnp.sum(vv)
            float(acc)
            dt = max(time.perf_counter() - t0 - rtt, 1e-9)
            qps = B * reps / dt
            print(f"[eval] p={p_tiles} ({p_tiles/n_tiles:5.1%}) "
                  f"k_cand={k_cand} pools={n_pools} tq={tile_q} "
                  f"top2={int(top2)}: "
                  f"recall@10={r:.4f}  {qps:9.0f} qps/chip", flush=True)
        except Exception as e:
            print(f"[eval] {cfg_s}: FAILED {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)

    # --- budget table ---------------------------------------------------------
    rows_per_chip_100m = 100e6 / 8
    t_enc_100m = rows_per_chip_100m / enc_ps
    # populate scales linearly in rows; subtract the ~constant quantizer
    # training time measured separately is folded in (conservative: keep it)
    t_pop_100m = t_build * (rows_per_chip_100m / n)
    total = t_enc_100m + t_pop_100m
    print("\nbuild budget — 100M×768 on v5e-8 (per-chip share 12.5M rows):",
          flush=True)
    print(f"  encode   {t_enc_100m/60:6.1f} min  (measured {enc_ps:,.0f} "
          f"passages/s/chip, 8-way row-parallel)", flush=True)
    print(f"  build    {t_pop_100m/60:6.1f} min  (measured {t_build:.0f} s "
          f"for {n/1e6:.0f}M/chip incl. quantizer training, linear in rows)",
          flush=True)
    print(f"  TOTAL    {total/60:6.1f} min  vs 60 min budget "
          f"({'PASS' if total < 3600 else 'FAIL'})", flush=True)


if __name__ == "__main__":
    main()
