"""On-chip band-pruned IVF benchmark: 1M×768 int8, nlist=1024.

Reports band width (the pruning factor), recall@10 vs exact, and fenced QPS;
compares against the full int8 scan from the same data.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, D, NLIST, K, B = 1_000_000, 768, 1024, 10, 1024


def main():
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex
    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas_int8
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

    db_d, q_d = mk(jax.random.PRNGKey(0))
    _, gt = tiled_topk(db_d, q_d, K, tile=8192)
    gt = jax.device_get(gt)
    print("data ready", flush=True)

    q = jax.device_get(q_d)  # small; band planning happens host-side

    t0 = time.perf_counter()
    idx = BandIVFIndex.build(db_d, nlist=NLIST, dtype="int8", kmeans_iters=10)
    print(f"band build (device-native): {time.perf_counter() - t0:.0f} s", flush=True)

    from cloudvectordb_tpu.index.ivf_band import _tiles_plan_search

    rtt = measure_fetch_rtt()
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    st = idx._device_state()
    qj = jnp.asarray(q)  # resident on device: exclude tunnel upload from QPS
    print(f"n_tiles={n_tiles}", flush=True)
    for p_tiles in (16, 32, 64):
        def run(noise):
            v, g = _tiles_plan_search(
                qj + noise, st["centroids"], st["payload"], st["ids"],
                st["tile_window"], idx._scale,
                k=K, p_tiles=p_tiles, tile_n=idx.tile_n, tile_q=idx.tile_q,
                int8=True, interpret=False,
            )
            return v, g, float(jnp.sum(v))
        v, g, _ = run(0.0)  # compile
        r = recall_at_k(jax.device_get(g), gt)
        iters = 3
        t0 = time.perf_counter()
        for it in range(iters):
            run(1e-4 * (it + 1))
        dt = max((time.perf_counter() - t0 - rtt * iters) / iters, 1e-9)
        print(
            f"p_tiles={p_tiles:4d} ({p_tiles/n_tiles:4.0%} of arena): "
            f"recall@10={r:.4f}  {dt*1000:7.1f} ms/batch ({B/dt:7.0f} qps)",
            flush=True,
        )

    # reference: full int8 scan on the same store
    payload = idx._device_state()["payload"]
    qj = jnp.asarray(q)
    def full(noise):
        v, i = flat_topk_pallas_int8(payload, idx._scale, qj + noise, K)
        return float(jnp.sum(v))
    full(0.0)
    t0 = time.perf_counter()
    for it in range(3):
        full(1e-4 * (it + 1))
    dt = max((time.perf_counter() - t0 - rtt * 3) / 3, 1e-9)
    print(f"full int8 scan: {dt*1000:.1f} ms/batch ({B/dt:.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
