"""Consolidated on-chip validation — ONE process, short phases, flushed output.

Run serially (the axon relay executes killed clients' queues to completion;
never run TPU jobs concurrently or kill them mid-flight). Phases:
  1. tiles-strategy IVF search: recall + fenced QPS at 250k×768
  2. IVF-PQ probe-scan search: recall + fenced QPS at 250k×768 m=64
  3. encoder fwd + train-step throughput (flagship MiniLM-class config)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, D, K, B = 250_000, 768, 10, 4096  # B ≫ nlist: the tile-sharing regime


def log(msg):
    print(msg, flush=True)


def main():
    from cloudvectordb_tpu.eval.qps import measure_fetch_rtt
    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.ops.topk import tiled_topk

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

    t0 = time.perf_counter()
    db_d, q_d = mk(jax.random.PRNGKey(0))
    _, gt = tiled_topk(db_d, q_d, K, tile=8192)
    gt = jax.device_get(gt)
    log(f"[0] data+oracle: {time.perf_counter()-t0:.0f}s")
    rtt = measure_fetch_rtt()
    log(f"[0] fetch rtt {rtt*1000:.0f} ms")

    # ---- phase 1: tiles-strategy band IVF ----
    from cloudvectordb_tpu.index.ivf_band import BandIVFIndex, _tiles_plan_search

    t0 = time.perf_counter()
    idx = BandIVFIndex.build(
        db_d, nlist=512, dtype="int8", kmeans_iters=8, tile_n=1024
    )
    log(f"[1] band build: {time.perf_counter()-t0:.0f}s")
    st = idx._device_state()
    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    q = jax.device_get(q_d)
    qj = jnp.asarray(q)
    for p_tiles in (32, 64, 96):
        def run(noise):
            v, g = _tiles_plan_search(
                qj + noise, st["centroids"], st["payload"], st["ids"],
                st["tile_window"], idx._scale,
                k=K, p_tiles=p_tiles, tile_n=idx.tile_n, tile_q=idx.tile_q,
                int8=True, interpret=False,
            )
            return g, float(jnp.sum(v))
        g, _ = run(0.0)
        r = recall_at_k(jax.device_get(g), gt)

        def run_many(reps, base):
            acc = jnp.float32(0)
            for it in range(reps):
                _, gg = _tiles_plan_search(
                    qj + (base + 1e-4 * it), st["centroids"], st["payload"],
                    st["ids"], st["tile_window"], idx._scale,
                    k=K, p_tiles=p_tiles, tile_n=idx.tile_n, tile_q=idx.tile_q,
                    int8=True, interpret=False,
                )
                acc = acc + jnp.sum(gg)
            return int(acc)  # one fetch fences all reps

        run_many(1, 0.5)
        reps = 10
        t0 = time.perf_counter()
        run_many(reps, 0.01)
        dt = max((time.perf_counter() - t0 - rtt) / reps, 1e-9)
        log(f"[1] tiles p={p_tiles} ({p_tiles/n_tiles:4.0%} of arena): "
            f"recall@10={r:.4f} {dt*1000:7.1f} ms/b ({B/dt:7.0f} qps)")

    # ---- phase 2: IVF-PQ probe-scan ----
    from cloudvectordb_tpu.index.ivf_pq import _ivfpq_scan_search
    from cloudvectordb_tpu.index.kmeans import train_kmeans
    from cloudvectordb_tpu.index.pq import pq_encode, train_pq
    from cloudvectordb_tpu.ops.assign import assign_clusters
    from cloudvectordb_tpu.utils.native import arena_sort

    NLIST = 512
    t0 = time.perf_counter()
    centroids, _ = train_kmeans(db_d[:131072], NLIST, iters=8, tile=8192)
    assign, _ = assign_clusters(db_d, centroids, tile=8192)
    resid0 = db_d[:131072] - centroids[assign[:131072]]
    codebooks = train_pq(resid0, 64, 8, iters=5)
    codes = pq_encode(db_d - centroids[assign], codebooks)
    a_np = jax.device_get(assign)
    codes_np = jax.device_get(codes)
    order, offsets = arena_sort(a_np, NLIST)
    arena = jnp.asarray(codes_np[order])
    ids_d = jnp.asarray(order.astype(np.int32))
    off_d = jnp.asarray(offsets[:-1].astype(np.int32))
    lens_d = jnp.asarray(np.diff(offsets).astype(np.int32))
    cap = int(np.diff(offsets).max())
    log(f"[2] ivfpq build: {time.perf_counter()-t0:.0f}s cap={cap}")
    # int8 refine rows for second-stage rescoring (by original id)
    dbf = db_d.astype(jnp.float32)
    r_scale = float(jnp.minimum(jnp.max(jnp.abs(dbf)), 4.0 * jnp.sqrt(jnp.mean(dbf * dbf))) / 127.0)
    refine_rows = jnp.clip(jnp.round(dbf / r_scale), -127, 127).astype(jnp.int8)
    qb = qj[:256]
    for nprobe in (16, 64):
        def run2(noise):
            v, rows_a = _ivfpq_scan_search(
                qb + noise, centroids, arena, off_d, lens_d, codebooks,
                k=160, nprobe=nprobe, cap=cap, metric="ip", residual=True,
            )
            i = ids_d[rows_a]  # arena rows → global ids (r3 signature)
            # refine: exact int8 rescore of the ADC top-160
            rows = refine_rows[jnp.clip(i, 0, refine_rows.shape[0] - 1)]
            ex = jnp.einsum("bd,brd->br", qb + noise,
                            rows.astype(jnp.float32) * r_scale)
            v2, pos = jax.lax.top_k(ex, K)
            i2 = jnp.take_along_axis(i, pos, axis=1)
            return i2, float(jnp.sum(v2))
        i, _ = run2(0.0)
        r = recall_at_k(jax.device_get(i), gt[:256])
        t0 = time.perf_counter()
        for it in range(3):
            run2(1e-4 * (it + 1))
        dt = max((time.perf_counter() - t0 - rtt * 3) / 3, 1e-9)
        log(f"[2] ivfpq nprobe={nprobe}: recall@10={r:.4f} "
            f"{dt*1000:7.1f} ms/b ({256/dt:7.0f} qps)")

    # ---- phase 3: encoder throughput ----
    from cloudvectordb_tpu.models.encoder import init_encoder
    from cloudvectordb_tpu.utils.config import EncoderConfig

    cfg = EncoderConfig(max_len=128)
    model, params = init_encoder(cfg, seed=0)
    EB = 512
    fwd = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m, True))

    @jax.jit
    def mkbatch(key):
        ids = jax.random.randint(key, (EB, cfg.max_len), 0, cfg.vocab_size)
        return ids, jnp.ones_like(ids)

    batches = [mkbatch(jax.random.PRNGKey(i)) for i in range(6)]
    float(jnp.sum(fwd(params, *batches[0])))
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(5):
        acc = acc + jnp.sum(fwd(params, *batches[(i + 1) % 6]))
    float(acc)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    eps = EB * 5 / dt
    log(f"[3] encode fwd (B={EB}, L={cfg.max_len}): {eps:,.0f} passages/s/chip "
        f"→ 100M on v5e-8 in {1e8/(8*eps)/60:.1f} min")


if __name__ == "__main__":
    main()
