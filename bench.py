"""Round benchmark — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline (scaled to the single visible chip): 1M×768d unit vectors, int8
arena, query-clustered tile-pruned IVF search (index/ivf_band.py) at batch
4096, k=10; recall measured against the exact on-device oracle.
vs_baseline = measured QPS / per-chip share of the BASELINE target
(50k QPS on v5e-8 → 6,250 QPS/chip). Falls back to the fused int8 flat scan
if the IVF path fails for any reason.

Axon-tunnel measurement rules (see eval/qps.py): data generated on device,
inputs varied per iteration, one device_get fences all timed work, fetch RTT
subtracted.
"""

from __future__ import annotations

import json
import time
import traceback

N, D, K, B, NLIST, P_TILES = 1_000_000, 768, 10, 4096, 1024, 64
TARGET_QPS_PER_CHIP = 50_000 / 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.eval.recall import recall_at_k

    on_tpu = jax.default_backend() in ("tpu",) or "TPU" in str(jax.devices()[0])
    n = N if on_tpu else 20_000

    # Low intrinsic dimension, like real embeddings: isotropic 768-d
    # Gaussians concentrate all pairwise distances (no margins), which makes
    # any quantized search look artificially bad. Synthesize in a 64-d
    # latent and embed with a random orthogonal-ish map.
    LATENT = 32

    @jax.jit
    def make_data(key):
        kc, ka, kn, kq, kqn, kw = jax.random.split(key, 6)
        w = jax.random.normal(kw, (LATENT, D), jnp.float32) / (LATENT ** 0.5)
        centers = jax.random.normal(kc, (256, LATENT), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        assign = jax.random.randint(ka, (n,), 0, 256)
        z = centers[assign] + (0.3 / (LATENT ** 0.5)) * jax.random.normal(
            kn, (n, LATENT), jnp.float32)
        db = z @ w
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        qsel = jax.random.randint(kq, (B,), 0, n)
        zq = z[qsel] + (0.15 / (LATENT ** 0.5)) * jax.random.normal(
            kqn, (B, LATENT), jnp.float32)
        q = zq @ w
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return db, q

    db, queries = make_data(jax.random.PRNGKey(0))
    _, gt = tiled_topk(db, queries[:512], K, tile=8192)
    gt = jax.device_get(gt)

    def measure_rtt():
        trivial = jax.jit(lambda x: jnp.sum(x))
        small = jnp.ones((8, 128))
        float(trivial(small))
        t0 = time.perf_counter()
        for i in range(5):
            float(trivial(small + i))
        return (time.perf_counter() - t0) / 5

    def bench_tiles():
        from cloudvectordb_tpu.index.ivf_band import BandIVFIndex, _tiles_plan_search

        idx = BandIVFIndex.build(db, nlist=NLIST, dtype="int8", kmeans_iters=10)
        st = idx._device_state()

        def one(noise):
            return _tiles_plan_search(
                queries + noise, st["centroids"], st["payload"], st["ids"],
                st["tile_window"], idx._scale,
                k=K, p_tiles=P_TILES, tile_n=idx.tile_n, tile_q=idx.tile_q,
                int8=True, interpret=False,
            )

        _, g = one(0.0)  # compile
        recall = recall_at_k(jax.device_get(g)[:512], gt)
        rtt = measure_rtt()

        def run_many(reps, base):
            acc = jnp.float32(0)
            for it in range(reps):
                v, _ = one(base + 1e-4 * it)
                acc = acc + jnp.sum(v)
            return float(acc)

        run_many(2, 0.5)  # warm
        reps = 64  # the kernel is ~ms-fast: work must dwarf the fetch RTT
        t0 = time.perf_counter()
        run_many(reps, 0.01)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        n_tiles = int(idx._payload.shape[0]) // idx.tile_n
        return (
            f"tiles_ivf_qps_{n}x{D}_k{K}_p{P_TILES}of{n_tiles}_recall{recall:.3f}",
            B * reps / dt,
        )

    def bench_flat_int8():
        if on_tpu:
            from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas_int8

            dbf = db.astype(jnp.float32)
            rms = jnp.sqrt(jnp.mean(dbf * dbf))
            scale = float(jnp.minimum(jnp.max(jnp.abs(dbf)), 4.0 * rms) / 127.0)
            db_i8 = jnp.clip(jnp.round(dbf / scale), -127, 127).astype(jnp.int8)

            def one(noise):
                return flat_topk_pallas_int8(db_i8, scale, queries + noise, K)
        else:  # CPU smoke path: exact XLA scan (Mosaic kernels need the TPU)

            def one(noise):
                return tiled_topk(db, queries + noise, K, tile=8192)

        _, f = one(0.0)
        recall = recall_at_k(jax.device_get(f)[:512], gt)
        rtt = measure_rtt()

        def run_many(reps, base):
            acc = jnp.float32(0)
            for it in range(reps):
                v, _ = one(base + 1e-4 * it)
                acc = acc + jnp.sum(v)
            return float(acc)

        run_many(1, 0.5)
        reps = 4
        t0 = time.perf_counter()
        run_many(reps, 0.01)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        return f"int8_flat_qps_{n}x{D}_k{K}_recall{recall:.3f}", B * reps / dt

    try:
        if not on_tpu:
            raise RuntimeError("tiles path benches on TPU only")
        metric, qps = bench_tiles()
    except Exception:
        traceback.print_exc()
        metric, qps = bench_flat_int8()

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(qps, 1),
                "unit": "qps/chip",
                "vs_baseline": round(qps / TARGET_QPS_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
