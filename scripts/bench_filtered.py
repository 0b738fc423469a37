"""Filtered-search bench at headline scale (12.5M×768/chip, residual-int8
tiles): recall@10 vs the FILTER-RESTRICTED exact oracle + device QPS across
selectivities, at the headline op point (p=448, tq=128).

What this measures: the cost of `where=` on the serving path. The allow
bitmap adds one (N,) int8 gather per search + tile_n bytes/tile of kernel
traffic (~0.13% of payload bytes) — QPS should be within noise of the
unfiltered headline. Recall at LOW selectivity degrades at fixed p_tiles
(probed tiles hold fewer allowed rows — the planner is selectivity-blind,
documented in index/filters.py); the sweep quantifies it and shows the
p_tiles knob recovering it.

Ground truth: per-chunk exact top-64 (tiled_topk), post-filtered, merged —
at ≥1% selectivity the probability that fewer than 10 allowed rows land in
a 500k-chunk's top-64 is negligible, so the merged GT is exact to <1e-3.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_filtered.py
Env: N_ROWS (default 12.5M), SELS (default "0.5,0.1,0.01").
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np

D, K, B, LATENT, NCENTERS = 768, 10, 4096, 32, 256
N = int(os.environ.get("N_ROWS", 12_500_000))
CHUNK = 500_000
NLIST = 4096
P_TILES = int(os.environ.get("BENCH_P", 448))
TILE_Q = int(os.environ.get("BENCH_TQ", 128))
NQ_GT = 512
GT_PER_CHUNK = 64
SELS = [float(s) for s in os.environ.get("SELS", "0.5,0.1,0.01").split(",")]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex
    from cloudvectordb_tpu.ops.topk import tiled_topk

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

    n_chunks = N // CHUNK

    def chunk_fn(i):
        return gen(jax.random.PRNGKey(i), CHUNK)

    kq, kn = jax.random.split(jax.random.PRNGKey(7777))
    base = chunk_fn(0)
    sel = jax.random.randint(kq, (B,), 0, CHUNK)
    q = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
        kn, (B, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    print(f"build: {N}x{D} residual-int8, nlist={NLIST}", flush=True)
    t0 = time.perf_counter()
    idx = BandIVFIndex.build_device_streaming(
        chunk_fn, n_chunks, nlist=NLIST, kmeans_iters=10, residual=True)
    print(f"build {time.perf_counter() - t0:.0f}s", flush=True)

    def measure_rtt():
        trivial = jax.jit(lambda x: jnp.sum(x))
        small = jnp.ones((8, 128))
        float(trivial(small))
        t0 = time.perf_counter()
        for i in range(5):
            float(trivial(small + i))
        return (time.perf_counter() - t0) / 5

    def fenced_qps(run, reps=8):
        rtt = measure_rtt()
        acc = jnp.float32(0)
        for it in range(2):
            vv, _ = run(0.5 + 1e-4 * it)
            acc = acc + jnp.sum(jnp.where(jnp.isfinite(vv), vv, 0.0))
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for it in range(reps):
            vv, _ = run(1e-4 * (it + 1))
            acc = acc + jnp.sum(jnp.where(jnp.isfinite(vv), vv, 0.0))
        float(acc)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        return B * reps / dt

    @jax.jit
    def gt_merge(bv, bi, cv, ci, base_row):
        av = jnp.concatenate([bv, cv], axis=1)
        ai = jnp.concatenate([bi, ci + base_row], axis=1)
        v, p = jax.lax.top_k(av, K)
        return v, jnp.take_along_axis(ai, p, axis=1)

    rng = np.random.default_rng(42)
    # unfiltered reference at the same op point
    vd, fd = idx.search_device(q, K, p_tiles=P_TILES, tile_q=TILE_Q)

    for sel_frac in SELS:
        mask = rng.random(N) < sel_frac
        flt = idx.make_filter(mask)
        # filtered exact GT: per-chunk top-64, post-filter, merge
        best_v = jnp.full((NQ_GT, K), -jnp.inf)
        best_i = jnp.zeros((NQ_GT, K), jnp.int32)
        for ci in range(n_chunks):
            cv, cidx = tiled_topk(chunk_fn(ci), q[:NQ_GT], GT_PER_CHUNK,
                                  tile=8192)
            ok = mask[ci * CHUNK : (ci + 1) * CHUNK][np.asarray(cidx)]
            cv = jnp.where(jnp.asarray(ok), cv, -jnp.inf)
            best_v, best_i = gt_merge(best_v, best_i, cv, cidx, ci * CHUNK)
        gt = jax.device_get(best_i)

        def run(noise, _flt=flt):
            return idx.search_device(q + noise, K, p_tiles=P_TILES,
                                     tile_q=TILE_Q, where=_flt)

        v, f = run(0.0)
        f_np = jax.device_get(f)[:NQ_GT]
        ok_all = bool(flt.allowed_np(f_np[f_np >= 0]).all())
        r = recall_at_k(np.where(f_np >= 0, f_np, -1), gt)
        qps = fenced_qps(run)
        print(f"sel={sel_frac:5.2f}  recall@10={r:.4f}  "
              f"qps={qps:,.0f}  all_allowed={ok_all}  "
              f"p={P_TILES} tq={TILE_Q}", flush=True)
        if sel_frac <= 0.05:
            # selectivity-blind planning: show the p_tiles knob recovering
            for p2 in (P_TILES * 2, P_TILES * 4):
                def run2(noise, _flt=flt, _p=p2):
                    return idx.search_device(q + noise, K, p_tiles=_p,
                                             tile_q=TILE_Q, where=_flt)
                v2, f2 = run2(0.0)
                f2n = jax.device_get(f2)[:NQ_GT]
                r2 = recall_at_k(np.where(f2n >= 0, f2n, -1), gt)
                qps2 = fenced_qps(run2)
                print(f"       p={p2}: recall@10={r2:.4f}  qps={qps2:,.0f}",
                      flush=True)

    # unfiltered headline sanity at the same op point
    from cloudvectordb_tpu.eval.recall import recall_at_k as _r

    def run_u(noise):
        return idx.search_device(q + noise, K, p_tiles=P_TILES,
                                 tile_q=TILE_Q)

    qps_u = fenced_qps(run_u)
    print(f"unfiltered same-op-point qps={qps_u:,.0f}", flush=True)


if __name__ == "__main__":
    main()
