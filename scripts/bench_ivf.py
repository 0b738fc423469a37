"""On-chip IVF-PQ probe-scan benchmark: recall + fenced QPS at 1M×768, m=64.

Exercises BASELINE config #3's shape on the single visible chip: build
(k-means + PQ train + encode + arena) wall-clock, then query at several
nprobe settings. Timing fences via device_get (see eval/qps.py docstring).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, D, M, NLIST, K, B = 1_000_000, 768, 64, 1024, 10, 256


def main():
    from cloudvectordb_tpu.index.ivf_pq import IVFPQIndex, _ivfpq_scan_search
    from cloudvectordb_tpu.index.kmeans import train_kmeans
    from cloudvectordb_tpu.index.pq import pq_encode, train_pq
    from cloudvectordb_tpu.ops.assign import assign_clusters
    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt

    @jax.jit
    def mk(key):
        kc, ka, kn, kq, kqn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (256, D), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        a = jax.random.randint(ka, (N,), 0, 256)
        db = centers[a] +  (0.3 / (D ** 0.5)) * jax.random.normal(kn, (N, D), jnp.float32)
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        qs = jax.random.randint(kq, (B,), 0, N)
        q = db[qs] + (0.1 / (D ** 0.5)) * jax.random.normal(kqn, (B, D), jnp.float32)
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return db, q

    db, q = mk(jax.random.PRNGKey(0))
    _, gt = tiled_topk(db, q, K, tile=8192)
    gt = jax.device_get(gt)
    print("data + ground truth ready", flush=True)

    # ---- build (all on device, chunked to fit 16 GB HBM) ----
    t0 = time.perf_counter()
    sample = db[:262_144]
    centroids, _ = train_kmeans(sample, NLIST, iters=10, tile=8192)
    assign, _ = assign_clusters(db, centroids, tile=8192)
    resid0 = sample - centroids[assign[:262_144]]
    codebooks = train_pq(resid0, M, 8, iters=6)
    del resid0
    CH = 250_000
    code_chunks = []
    for s in range(0, N, CH):
        r = db[s : s + CH] - centroids[assign[s : s + CH]]
        code_chunks.append(pq_encode(r, codebooks))
    codes = jnp.concatenate(code_chunks)
    del code_chunks
    # fence build
    float(jnp.sum(codes[:8].astype(jnp.float32))) + float(jnp.sum(centroids[0]))
    t_build = time.perf_counter() - t0
    print(f"build (kmeans+assign+pq+encode) on device: {t_build:.1f} s for {N} vecs", flush=True)

    # ---- arena on host (sort by list) ----
    t0 = time.perf_counter()
    a_np = jax.device_get(assign)
    codes_np = jax.device_get(codes)
    order = np.argsort(a_np, kind="stable")
    arena = codes_np[order]
    ids = order.astype(np.int32)
    counts = np.bincount(a_np, minlength=NLIST)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1].astype(np.int32)
    lens = counts.astype(np.int32)
    cap = int(lens.max())
    print(f"arena sort (host): {time.perf_counter() - t0:.1f} s, cap={cap}", flush=True)

    arena_d = jnp.asarray(arena)
    ids_d = jnp.asarray(ids)
    off_d = jnp.asarray(offsets)
    lens_d = jnp.asarray(lens)
    cb_d = codebooks
    cent_d = centroids

    rtt = measure_fetch_rtt()
    print(f"fetch rtt {rtt*1000:.0f} ms", flush=True)
    for nprobe in (16,):
        def run(noise):
            v, rows = _ivfpq_scan_search(
                q + noise, cent_d, arena_d, off_d, lens_d, cb_d,
                k=K, nprobe=nprobe, cap=cap, metric="ip", residual=True,
            )
            i = ids_d[rows]  # arena rows → global ids (r3 signature)
            return v, i, float(jnp.sum(v))
        v, i, _ = run(0.0)  # compile
        r = recall_at_k(jax.device_get(i), gt)
        t0 = time.perf_counter()
        iters = 3
        acc = 0.0
        for it in range(iters):
            *_, s = run(1e-4 * (it + 1))
            acc += s
        dt = max(time.perf_counter() - t0 - rtt * iters, 1e-9)
        print(
            f"nprobe={nprobe}: recall@10={r:.4f}  {dt/iters*1000:7.1f} ms/batch"
            f"  {B*iters/dt:8.0f} qps"
        )


if __name__ == "__main__":
    main()
