"""Small-batch latency (r3 VERDICT item 7): p50/p99 per-call latency of the
flagship residual-int8 tiles index at B ∈ {1, 8, 64} — the serving story a
B=4096 throughput headline doesn't cover.

Usage: python scripts/bench_latency.py [N_millions=12.5]
Env:   LAT_BATCHES="1,8,64", LAT_REPS=30, BENCH_NLIST=4096

Op point per batch size: tile_q = max(8, B) (one query group — the shared
tile table is exactly the batch's union span) and span-aware auto p_tiles.
Through the axon dev tunnel every call pays a ~40–130 ms fetch RTT that
real-hardware serving does not; the table reports raw wall latency, the
RTT, and the RTT-subtracted device estimate, flagged when RTT-bound.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

D, K, LATENT, NCENTERS = 768, 10, 32, 256
CHUNK = 500_000


def main():
    from cloudvectordb_tpu.eval.qps import device_seconds, measure_fetch_rtt
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 12.5
    n = int(n_m * 1e6)
    nlist = int(os.environ.get("BENCH_NLIST", 4096))
    batches = [int(b) for b in
               os.environ.get("LAT_BATCHES", "1,8,64").split(",")]
    reps = int(os.environ.get("LAT_REPS", "30"))
    n_chunks = -(-n // CHUNK)
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

    t0 = time.perf_counter()
    idx = BandIVFIndex.build_device_streaming(
        chunk_fn, n_chunks, nlist=nlist, kmeans_iters=10, residual=True,
    )
    print(f"[build] {n/1e6:.1f}M rows in {time.perf_counter()-t0:.0f} s",
          flush=True)
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n

    # query pool: perturbed DB rows (same generator as bench.py), fetched
    # host-side once so each timed call ships only B rows. First 4096 rows
    # of chunk 0 → global ids 0..4095 (streaming builds: id = source row)
    base = np.asarray(chunk_fn(0)[:4096])
    kq, kn2 = jax.random.split(jax.random.PRNGKey(7777))
    sel = np.asarray(jax.random.randint(kq, (4096,), 0, 4096))
    qpool = base[sel] + (0.15 / (D ** 0.5)) * np.asarray(
        jax.random.normal(kn2, (4096, D), jnp.float32))
    qpool /= np.linalg.norm(qpool, axis=1, keepdims=True)

    from cloudvectordb_tpu.index.ivf_band import _tiles_resid_plan_search

    st = idx._device_state()
    qdev = jnp.asarray(qpool)

    rtt = measure_fetch_rtt()
    print(f"fetch rtt {rtt*1000:.0f} ms", flush=True)
    print(f"{'B':>4} {'tq':>4} {'p':>5}  {'p50 raw':>9} {'p99 raw':>9} "
          f"{'dev/call':>9}  {'qps@dev':>8}  rtt-bound", flush=True)
    for B in batches:
        tq = max(8, B)
        p = idx._auto_p_tiles(B, 32, n_tiles, tile_q=tq)
        # warm the (p, tq) executable
        idx.search(qpool[:B], K, p_tiles=p, tile_q=tq)
        lats = []
        for it in range(reps):
            q = qpool[(it * B) % 4000 : (it * B) % 4000 + B]
            t1 = time.perf_counter()
            idx.search(q, K, p_tiles=p, tile_q=tq)  # np outputs fence
            lats.append(time.perf_counter() - t1)
        lats = np.sort(lats)
        p50, p99 = lats[len(lats) // 2], lats[int(len(lats) * 0.99)]

        # Per-call raw wall time through the dev relay is fetch-RTT-bound at
        # these batch sizes; the DEVICE latency comes from the differential
        # fold in eval/qps.py::device_seconds (methodology documented
        # there). Kernel batch = tq (idx.search pads B→tq the same way), so
        # each folded step matches the host API's device work exactly.
        def step(i, qd, centroids, payload, local, ctiles, scale, ids,
                 twin, vend):
            q = jax.lax.dynamic_slice_in_dim(qd, (i * B) % 4000, tq)
            v, _ = _tiles_resid_plan_search(
                q + 1e-4 * i.astype(jnp.float32), centroids, payload,
                local, ctiles, scale, ids, twin, vend, k=K, p_tiles=p,
                tile_n=idx.tile_n, tile_q=tq, interpret=False)
            return jnp.sum(v)

        # R scaled so the 2R−R delta is well above relay RTT jitter even
        # when per-call device time is sub-ms (small B on a pruned plan)
        R = min(1024, max(reps, 4096 // max(B, 1)))
        dev = device_seconds(
            step, qdev, st["centroids"], st["payload"], st["local"],
            st["centroid_tiles"], idx._scale, st["ids"], st["tile_window"],
            st["valid_end"], reps=R)
        bound = dev < 0.2 * p50
        print(f"{B:>4} {tq:>4} {p:>5}  {p50*1e3:8.1f}ms {p99*1e3:8.1f}ms "
              f"{dev*1e3:8.2f}ms  {B/max(dev, 1e-9):8.0f}  "
              f"{'YES' if bound else 'no'}", flush=True)

    # recall sanity at the smallest batch's op point (512 queries, exact GT
    # over a 1-chunk slice is too small — use self-hit on DB rows instead)
    qs = base[:256]
    tq = max(8, batches[0])
    p = idx._auto_p_tiles(batches[0], 32, n_tiles, tile_q=tq)
    hits = 0
    for i in range(0, 256, max(1, batches[0])):
        b = max(1, batches[0])
        _, f = idx.search(qs[i : i + b], 1, p_tiles=p, tile_q=tq)
        hits += int((f[:, 0] == np.arange(i, i + b)).sum())
    print(f"[sanity] self-hit@1 on {256} DB rows at B={batches[0]} op "
          f"point: {hits/256:.3f}", flush=True)


if __name__ == "__main__":
    main()
