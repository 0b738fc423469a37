"""Sweep kernel candidate pools (n_pools) × refine depth for BandIVFPQ.

CAVEAT (r2 finding, DESIGN.md §10): passing n_pools at a fixed refine_factor
keeps the TOTAL slot count constant (l_buckets shrinks to k_cand/n_pools), so
per-slot competition is unchanged — to actually test shadowing recovery,
raise refine_factor so n_pools·l_buckets grows (and shrink tile_q to fit the
16·tile_q·slots VMEM budget). The dominant recall lever at fixed coverage is
the shared-tile-table span (tile_q vs batch size), not pools.

Usage: python scripts/sweep_pq_pools.py [N_millions=2] [nlist=2048] [p_tiles=0]
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
CHUNK = 250_000
NQ_GT = 512


def main():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.index.ivf_band import BandIVFPQIndex
    from cloudvectordb_tpu.ops.topk import tiled_topk

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    p_tiles_arg = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n = int(n_m * 1e6)
    sizes = [CHUNK] * (n // CHUNK) + ([n % CHUNK] if n % CHUNK else [])

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

    kq, kn2 = jax.random.split(jax.random.PRNGKey(7777))
    base = chunk_fn(0)
    sel = jax.random.randint(kq, (B,), 0, sizes[0])
    queries = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
        kn2, (B, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    q_gt_dev = queries[:NQ_GT]
    del base  # free the chunk before GT/build (HBM budget is ~12 GB here)

    t0 = time.perf_counter()
    best_v = jnp.full((NQ_GT, K), -jnp.inf)
    best_i = jnp.zeros((NQ_GT, K), jnp.int32)

    @jax.jit
    def gt_merge(bv, bi, cv, ci, base_row):
        av = jnp.concatenate([bv, cv], axis=1)
        ai = jnp.concatenate([bi, ci + base_row], axis=1)
        v, p = jax.lax.top_k(av, K)
        return v, jnp.take_along_axis(ai, p, axis=1)

    row0 = 0
    for ci in range(len(sizes)):
        c = chunk_fn(ci)
        cv, ci_ = tiled_topk(c, q_gt_dev, K, metric="ip")
        best_v, best_i = gt_merge(best_v, best_i, cv, ci_, row0)
        row0 += sizes[ci]
    gt = np.asarray(best_i)
    print(f"gt {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    idx = BandIVFPQIndex.build_device_streaming(
        chunk_fn, len(sizes), nlist=nlist, m=64, nbits=8, opq=True,
        refine="int8", tile_n=1024, tile_q=128, train_sample=131072,
    )
    print(f"build {time.perf_counter() - t0:.0f}s n={idx._n}", flush=True)
    n_tiles = idx._n_pad_rows // idx.tile_n
    p_tiles = p_tiles_arg or max(8, round(0.105 * n_tiles))
    qh = np.asarray(queries)
    rtt = measure_fetch_rtt()

    # (n_pools, refine_factor, top2): top2 rows measure the per-bucket
    # top-2 merge — same tile traffic as the matching top1 row, but each
    # pool keeps the best TWO distinct rows per bucket (k_cand doubles; the
    # top1 row with 2× pools is the equal-VMEM control)
    for n_pools, rf, top2 in [
        (1, 16, False), (1, 102, False), (2, 102, False), (1, 102, True),
        (2, 102, True), (4, 102, False), (4, 409, False), (2, 409, True),
        (4, 409, True), (8, 409, False),
    ]:
        try:
            s, f = idx.search(qh[:NQ_GT], K, p_tiles=p_tiles,
                              refine_factor=rf, n_pools=n_pools, top2=top2)
            r = recall_at_k(f, gt)
            # fenced timing on the full batch, varied inputs
            ts = time.perf_counter()
            reps = 8
            for it in range(reps):
                qv = np.roll(qh, it + 1, axis=0)
                s2, _ = idx.search(qv, K, p_tiles=p_tiles,
                                   refine_factor=rf, n_pools=n_pools,
                                   top2=top2)
                _ = float(np.asarray(s2).sum())
            raw = (time.perf_counter() - ts) / reps
            # same floor as eval/qps.py: fast configs can land within RTT
            # noise — flag instead of printing a negative/absurd rate
            rtt_bound = raw - rtt < 0.05 * raw
            dt = raw if rtt_bound else raw - rtt
            tag = " (rtt-bound)" if rtt_bound else ""
            print(f"pools={n_pools} rf={rf} top2={int(top2)}: "
                  f"recall@10 {r:.4f}  {B / dt:,.0f} qps{tag}  "
                  f"p_tiles={p_tiles}/{n_tiles}", flush=True)
        except Exception as e:  # VMEM overflow → HTTP 500 remote compile
            print(f"pools={n_pools} rf={rf} top2={int(top2)}: FAILED "
                  f"{type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
