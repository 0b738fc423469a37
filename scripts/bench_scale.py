"""Config #4 per-chip share: N×768 int8 tiles index built device-resident.

Usage: python scripts/bench_scale.py [N_millions] [nlist]

Demonstrates BASELINE config #4's per-chip slice (100M / 8 chips = 12.5M
rows) on the one visible chip: device-streaming build (the f32 corpus never
exists anywhere; the int8 arena never leaves HBM), exact ground truth from a
streamed full-precision scan, then a p_tiles sweep reporting recall@10 and
fenced QPS against the 6,250 QPS/chip share of the 50k target.

Data model matches bench.py: 32-d latent, 256 soft clusters, unit-norm —
realistic intrinsic dimension so quantized/pruned search is neither
artificially easy nor meaninglessly hard.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

D, K, B, LATENT, NCENTERS = 768, 10, 4096, 32, 256
CHUNK = int(os.environ.get("BENCH_CHUNK", 500_000))
NQ_GT = 512  # queries with exact ground truth (recall measurement)


def main():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex, _tiles_plan_search
    from cloudvectordb_tpu.ops.topk import tiled_topk

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 12.5
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n = int(n_m * 1e6)
    n_chunks = -(-n // CHUNK)
    sizes = [CHUNK] * (n // CHUNK) + ([n % CHUNK] if n % CHUNK else [])
    print(f"N={n} D={D} nlist={nlist} chunks={n_chunks}", flush=True)

    kw, kc = jax.random.split(jax.random.PRNGKey(1000))
    w = jax.random.normal(kw, (LATENT, D), jnp.float32) / (LATENT ** 0.5)
    centers = jax.random.normal(kc, (NCENTERS, LATENT), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    import functools

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
        base = gen(jax.random.PRNGKey(0), sizes[0])  # queries near chunk-0 rows
        sel = jax.random.randint(kq, (m,), 0, sizes[0])
        q = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
            kn, (m, D), jnp.float32)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    queries = gen_queries(jax.random.PRNGKey(7777), B)
    q_gt = queries[:NQ_GT]

    # --- exact ground truth: streamed full-precision scan ------------------
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
    print(f"ground truth: {time.perf_counter() - t0:.0f} s", flush=True)

    # --- device-resident build ---------------------------------------------
    residual = os.environ.get("BENCH_RESID", "1") == "1"
    t0 = time.perf_counter()
    idx = BandIVFIndex.build_device_streaming(
        chunk_fn, n_chunks, nlist=nlist, kmeans_iters=10, residual=residual,
    )
    build_s = time.perf_counter() - t0
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    print(f"build (device-streaming): {build_s:.0f} s, n_tiles={n_tiles}",
          flush=True)

    from cloudvectordb_tpu.index.ivf_band import _tiles_resid_plan_search

    st = idx._device_state()
    rtt = measure_fetch_rtt()
    nv = jnp.asarray(idx._n, jnp.int32)
    results = []
    modes = (sys.argv[4].split(",") if len(sys.argv) > 4
             else (["resid"] if residual else ["hybrid", "int8"]))
    p_list = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                               else ["128", "256", "512", "768", "1024"])]
    for mode in modes:
        int8_mode = "hybrid" if mode == "hybrid" else True
        for p_tiles in p_list:
            p_tiles = min(p_tiles, n_tiles)

            if mode == "resid":
                def run(noise):
                    return _tiles_resid_plan_search(
                        queries + noise, st["centroids"], st["payload"],
                        st["local"], st["centroid_tiles"], idx._scale,
                        st["ids"], st["tile_window"], st["valid_end"],
                        k=K, p_tiles=p_tiles, tile_n=idx.tile_n,
                        tile_q=idx.tile_q, interpret=False,
                    )
            else:
                def run(noise):
                    return _tiles_plan_search(
                        queries + noise, st["centroids"], st["payload"],
                        st["ids"], st["tile_window"], idx._scale, nv,
                        k=K, p_tiles=p_tiles, tile_n=idx.tile_n,
                        tile_q=idx.tile_q, int8=int8_mode, interpret=False,
                    )

            v, g = run(0.0)  # compile
            r = recall_at_k(jax.device_get(g)[:NQ_GT], gt)
            reps = 16
            acc = jnp.float32(0)
            for it in range(2):  # warm
                vv, _ = run(0.5 + 1e-4 * it)
                acc = acc + jnp.sum(vv)
            float(acc)
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for it in range(reps):
                vv, _ = run(1e-4 * (it + 1))
                acc = acc + jnp.sum(vv)
            float(acc)  # fence
            dt = max(time.perf_counter() - t0 - rtt, 1e-9)
            qps = B * reps / dt
            cov = p_tiles / n_tiles
            print(f"{mode:6s} p_tiles={p_tiles:5d} ({cov:5.1%}): "
                  f"recall@10={r:.4f}  {qps:9.0f} qps/chip "
                  f"({qps/6250:.1f}x share)", flush=True)
            results.append((mode, p_tiles, cov, r, qps))

    print("\nsummary", flush=True)
    for mode, p, cov, r, qps in results:
        print(f"  {mode:6s} {p:5d} {cov:5.1%} {r:.4f} {qps:9.0f}", flush=True)
    print(f"build_wallclock_s={build_s:.0f}", flush=True)


if __name__ == "__main__":
    main()
