"""BASELINE config #2: 1M passages × 384-d (MiniLM-L6 width), IVF-Flat
nlist=4096, nprobe sweep — recall-vs-QPS operating points.

Usage: python scripts/bench_config2.py [N=1000000] [nprobes=1,4,8,16,32,64]

Embedding distribution matches the headline bench (32-d latent, 256 soft
clusters, unit-norm) at MiniLM's 384-d output width. Two paths reported:

  - IVF-Flat probe-scan (the literal config-#2 structure): exact-IVF
    semantics, recall→1 as nprobe→nlist. Gather-bound on TPU — documented
    as the small-batch path.
  - residual-int8 tiles index on the SAME data (the serving path this
    framework recommends at 1M), for the recall/QPS comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

D, K, LATENT, NCENTERS = 384, 10, 32, 256


def main():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.eval.sweep import nprobe_sweep, operating_point
    from cloudvectordb_tpu.index.ivf_band import (
        BandIVFIndex, _tiles_resid_plan_search)
    from cloudvectordb_tpu.index.ivf_flat import IVFFlatIndex
    from cloudvectordb_tpu.ops.topk import tiled_topk

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    nprobes = tuple(int(x) for x in (
        sys.argv[2].split(",") if len(sys.argv) > 2 else
        ["1", "4", "8", "16", "32", "64"]))
    nlist = 4096
    nq = 512
    print(f"config#2: N={n} D={D} nlist={nlist} nprobes={nprobes}", flush=True)

    kw, kc = jax.random.split(jax.random.PRNGKey(1000))
    w = jax.random.normal(kw, (LATENT, D), jnp.float32) / (LATENT ** 0.5)
    centers = jax.random.normal(kc, (NCENTERS, LATENT), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    @jax.jit
    def gen(key):
        ka, kn = jax.random.split(key)
        a = jax.random.randint(ka, (n,), 0, NCENTERS)
        z = centers[a] + (0.3 / (LATENT ** 0.5)) * jax.random.normal(
            kn, (n, LATENT), jnp.float32)
        x = z @ w
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    db = gen(jax.random.PRNGKey(0))
    kq, kn2 = jax.random.split(jax.random.PRNGKey(7777))
    sel = jax.random.randint(kq, (nq,), 0, n)
    q = db[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
        kn2, (nq, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    _, gt = tiled_topk(db, q, K, tile=8192)
    gt = np.asarray(gt)
    q_np = np.asarray(q)
    print("data + exact gt ready", flush=True)

    # --- literal config #2: IVF-Flat, nprobe sweep ---------------------------
    t0 = time.perf_counter()
    ivf = IVFFlatIndex.build(np.asarray(db), nlist, metric="ip",
                             kmeans_iters=10, dtype="float32")
    print(f"IVF-Flat build: {time.perf_counter() - t0:.0f} s", flush=True)
    rows = nprobe_sweep(ivf, None, q_np, k=K, nprobes=nprobes, batch=256,
                        gt_ids=gt)
    print("\nIVF-Flat probe-scan (exact IVF semantics):", flush=True)
    for r in rows:
        print(f"  nprobe={r['nprobe']:4d}  recall@10={r['recall']:.4f}  "
              f"{r['qps']:8.0f} qps  {r['latency_ms']:.1f} ms/batch",
              flush=True)
    op = operating_point(rows, 0.95)
    if op:
        print(f"  operating point (recall≥0.95): nprobe={op['nprobe']} "
              f"at {op['qps']:.0f} qps", flush=True)

    # --- serving path on the same data: residual-int8 tiles ------------------
    t0 = time.perf_counter()
    idx = BandIVFIndex.build(db, nlist=1024, dtype="int8", residual=True,
                             kmeans_iters=10)
    print(f"\nresid-int8 tiles build: {time.perf_counter() - t0:.0f} s",
          flush=True)
    st = idx._device_state()
    nv = jnp.asarray(idx._n, jnp.int32)
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    B = 4096
    qb = jnp.tile(q, (B // nq, 1))
    rtt = measure_fetch_rtt()
    for p_tiles in (32, 64, 128):
        def run(noise):
            return _tiles_resid_plan_search(
                qb + noise, st["centroids"], st["payload"], st["local"],
                st["centroid_tiles"], idx._scale, st["ids"],
                st["tile_window"], st["valid_end"],
                k=K, p_tiles=p_tiles, tile_n=idx.tile_n, tile_q=idx.tile_q,
                interpret=False,
            )
        v, g = run(0.0)
        r = recall_at_k(np.asarray(g)[:nq], gt)
        reps = 16
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
        print(f"  p_tiles={p_tiles:4d} ({p_tiles/n_tiles:5.1%}): "
              f"recall@10={r:.4f}  {B*reps/dt:9.0f} qps/chip", flush=True)


if __name__ == "__main__":
    main()
