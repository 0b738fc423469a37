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
        BandIVFPQIndex, _pq_tiles_plan_search)
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
    q_gt = queries[:NQ_GT]

    # --- exact ground truth --------------------------------------------------
    t0 = time.perf_counter()
    best_v = jnp.full((NQ_GT, K), -jnp.inf)
    best_i = jnp.zeros((NQ_GT, K), jnp.int32)

    @jax.jit
    def gt_merge(bv, bi, cv, ci, base):
        av = jnp.concatenate([bv, cv], axis=1)
        ai = jnp.concatenate([bi, ci + base], axis=1)
        v, p = jax.lax.top_k(av, K)
        return v, jnp.take_along_axis(ai, p, axis=1)

    for ci in range(n_chunks):
        cv, cidx = tiled_topk(chunk_fn(ci), q_gt, K, tile=8192)
        best_v, best_i = gt_merge(best_v, best_i, cv, cidx, ci * CHUNK)
    gt = jax.device_get(best_i)
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
    cfg_list = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["0:1024:1:128", "0:4096:4:64", "512:4096:4:64"])
    for cfg_s in cfg_list:
        parts = [int(x) for x in cfg_s.split(":")]
        p_tiles, k_cand, n_pools, tile_q = (parts + [1, idx.tile_q])[:4]
        p_tiles = min(p_tiles, n_tiles) if p_tiles else idx._auto_p_tiles(
            B, 32, n_tiles, tile_q=tile_q)
        l_buckets = idx._derive_l_buckets(k_cand, n_pools)

        def run(noise):
            return _pq_tiles_plan_search(
                queries + noise, st["centroids"], st["codes"],
                st["codebooks"], st["refine"], st["ids"], st["tile_window"],
                st["centroid_tiles"], nv, st.get("local_rm"),
                k=K, k_cand=min(k_cand, n_pools * l_buckets),
                p_tiles=p_tiles, tile_n=idx.tile_n,
                tile_q=tile_q, interpret=False, refine_scale=idx._scale,
                row_major=idx._codes_row_major,
                refine_residual=idx._refine_residual,
                n_pools=n_pools, l_buckets=l_buckets,
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
                  f"k_cand={k_cand} pools={n_pools} tq={tile_q}: "
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
