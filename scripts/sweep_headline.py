"""Headline op-point sweep: 12.5M×768 residual-int8 tiles (BASELINE config
#4 per-chip share) over (tile_n, tile_q, p_tiles) — is there QPS above the
blessed p=640/tq=256/tile_n=2048 point at recall ≥ 0.97?

Usage: python scripts/sweep_headline.py [N_millions=12.5]
Env:   SWEEP_TILE_N="2048,4096", SWEEP_TQ="128,256", SWEEP_P="0.7,1.0,1.4"
       (fractions of the equal-coverage p for that tile_n)

Serves through the PUBLIC search_device API (all-device path) — the same
dispatch bench.py's private-call headline measures, plus ~µs of Python knob
resolution per call.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

D, K, B, LATENT, NCENTERS = 768, 10, 4096, 32, 256
CHUNK = 500_000
NQ_GT = 512


def main():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex
    from cloudvectordb_tpu.ops.topk import tiled_topk

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 12.5
    n = int(n_m * 1e6)
    n_chunks = n // CHUNK
    tile_ns = [int(x) for x in
               os.environ.get("SWEEP_TILE_N", "2048,4096").split(",")]
    tqs = [int(x) for x in os.environ.get("SWEEP_TQ", "128,256").split(",")]
    p_fracs = [float(x) for x in
               os.environ.get("SWEEP_P", "0.7,1.0,1.4").split(",")]

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
        return gen(jax.random.PRNGKey(i), CHUNK)

    kq, kn2 = jax.random.split(jax.random.PRNGKey(7777))
    base = chunk_fn(0)
    sel = jax.random.randint(kq, (B,), 0, CHUNK)
    queries = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
        kn2, (B, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    base = None

    best_v = jnp.full((NQ_GT, K), -jnp.inf)
    best_i = jnp.zeros((NQ_GT, K), jnp.int32)

    @jax.jit
    def gt_merge(bv, bi, cv, ci, base_row):
        av = jnp.concatenate([bv, cv], axis=1)
        ai = jnp.concatenate([bi, ci + base_row], axis=1)
        v, p = jax.lax.top_k(av, K)
        return v, jnp.take_along_axis(ai, p, axis=1)

    for ci in range(n_chunks):
        cv, cidx = tiled_topk(chunk_fn(ci), queries[:NQ_GT], K, tile=8192)
        best_v, best_i = gt_merge(best_v, best_i, cv, cidx, ci * CHUNK)
    gt = jax.device_get(best_i)
    print("[gt] done", flush=True)

    # reference coverage of the blessed point: 640/6104 ≈ 10.5%
    ref_cov = 640.0 / 6104.0
    for tile_n in tile_ns:
        t0 = time.perf_counter()
        idx = BandIVFIndex.build_device_streaming(
            chunk_fn, n_chunks, nlist=4096, kmeans_iters=10, residual=True,
            tile_n=tile_n,
        )
        n_tiles = int(idx._payload.shape[0]) // idx.tile_n
        print(f"[build] tile_n={tile_n}: {time.perf_counter()-t0:.0f} s, "
              f"n_tiles={n_tiles}", flush=True)
        rtt = measure_fetch_rtt()
        for tq in tqs:
            for frac in p_fracs:
                p = max(32, int(ref_cov * n_tiles * frac) // 32 * 32)
                if 4096 // tq * p * 4 > 512 * 1024:
                    print(f"  tq={tq} p={p}: SKIP (SMEM table)", flush=True)
                    continue

                def run(noise):
                    return idx.search_device(queries + noise, K,
                                             p_tiles=p, tile_q=tq)

                try:
                    _, g = run(0.0)
                    r = recall_at_k(np.asarray(jax.device_get(g))[:NQ_GT],
                                    gt)
                    acc = jnp.float32(0)
                    for it in range(2):
                        vv, _ = run(0.5 + 1e-4 * it)
                        acc = acc + jnp.sum(vv)
                    float(acc)
                    reps = 8
                    t0 = time.perf_counter()
                    acc = jnp.float32(0)
                    for it in range(reps):
                        vv, _ = run(1e-4 * (it + 1))
                        acc = acc + jnp.sum(vv)
                    float(acc)
                    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
                    print(f"  tile_n={tile_n} tq={tq:4d} p={p:5d} "
                          f"({p/n_tiles:5.1%}): recall@10={r:.4f}  "
                          f"{B*reps/dt:9.0f} qps/chip", flush=True)
                except Exception as e:
                    print(f"  tile_n={tile_n} tq={tq} p={p}: FAILED "
                          f"{type(e).__name__} {str(e)[:120]}", flush=True)
        idx = None  # free the 9.6 GB arena before the next build


if __name__ == "__main__":
    main()
