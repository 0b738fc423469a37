"""Round benchmark — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (scaled to the single visible chip): 1M×768d clustered unit
vectors resident in HBM, batched top-10 IP search via the fused Pallas
distance+top-k scan; recall measured against the exact on-device oracle.
vs_baseline = measured QPS / per-chip share of the BASELINE target
(50k QPS on v5e-8 → 6,250 QPS/chip).

All data is generated ON DEVICE — the dev environment reaches the TPU through
a tunnel, so host↔device transfers of GB-scale arrays would dominate wall
clock and measure the tunnel, not the chip.
"""

from __future__ import annotations

import json
import time

N, D, K, BATCH, NQ = 1_000_000, 768, 10, 1024, 4096
TARGET_QPS_PER_CHIP = 50_000 / 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas
    from cloudvectordb_tpu.ops.topk import tiled_topk
    from cloudvectordb_tpu.eval.recall import recall_at_k

    on_tpu = jax.default_backend() in ("tpu",) or "TPU" in str(jax.devices()[0])
    n = N if on_tpu else 20_000  # CPU fallback keeps the script runnable

    @jax.jit
    def make_data(key):
        kc, ka, kn, kq, kqn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (256, D), jnp.float32)
        centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
        assign = jax.random.randint(ka, (n,), 0, 256)
        db = centers[assign] +  (0.3 / (D ** 0.5)) * jax.random.normal(kn, (n, D), jnp.float32)
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        qsel = jax.random.randint(kq, (NQ,), 0, n)
        q = db[qsel] + (0.1 / (D ** 0.5)) * jax.random.normal(kqn, (NQ, D), jnp.float32)
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return db.astype(jnp.bfloat16), q.astype(jnp.bfloat16)

    db, queries = jax.block_until_ready(make_data(jax.random.PRNGKey(0)))
    # int8 store: the serving configuration (2× MXU rate, 2× less HBM than
    # bf16). Clip-scale at 4×rms — using the full ±127 range on the bulk of
    # the distribution instead of stretching to outliers buys ~1.5 bits.
    dbf = db.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(dbf * dbf))
    db_scale = float(jnp.minimum(jnp.max(jnp.abs(dbf)), 4.0 * rms) / 127.0)
    db_i8 = jnp.clip(jnp.round(dbf / db_scale), -127, 127).astype(jnp.int8)

    if on_tpu:
        from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas_int8

        search = lambda qb: flat_topk_pallas_int8(  # noqa: E731
            db_i8, db_scale, qb.astype(jnp.float32), K
        )
    else:
        search = lambda qb: tiled_topk(db, qb, K)  # noqa: E731

    # recall vs the exact on-device oracle, on a query subsample
    sub = queries[:256]
    _, gt = tiled_topk(db.astype(jnp.float32), sub.astype(jnp.float32), K, tile=8192)
    _, found = search(sub)
    recall = recall_at_k(
        jax.device_get(found), jax.device_get(gt)
    )

    # Timing under the axon tunnel: block_until_ready does NOT block, so the
    # only true fence is a device_get of a value depending on all timed work.
    # Dispatch every batch, reduce all results into one scalar, fetch it once,
    # and subtract the separately-measured fetch RTT.
    def run_all(iters: int, base: float) -> float:
        """Dispatch iters passes over all batches; ONE fetch fences it all.
        Per-iteration noise defeats relay-level result caching."""
        acc = jnp.float32(0)
        for it in range(iters):
            noise = jnp.asarray(base + 1e-4 * it, queries.dtype)
            for s in range(0, NQ, BATCH):
                v, _ = search(queries[s : s + BATCH] + noise)
                acc = acc + jnp.sum(v)
        return float(acc)  # the fence

    run_all(1, 0.0)  # compile + warm + materialize db remotely
    trivial = jax.jit(lambda x: jnp.sum(x))
    small = jnp.ones((8, 128))
    t0 = time.perf_counter()
    n_rtt = 5
    for i in range(n_rtt):
        float(trivial(small + i))
    rtt = (time.perf_counter() - t0) / n_rtt

    iters = 4
    t0 = time.perf_counter()
    run_all(iters, 0.01)
    dt = max(time.perf_counter() - t0 - rtt, 1e-6)  # one fetch → one RTT
    qps = NQ * iters / dt

    print(
        json.dumps(
            {
                "metric": f"int8_flat_search_qps_{n}x{D}_k{K}_recall{recall:.3f}",
                "value": round(qps, 1),
                "unit": "qps/chip",
                "vs_baseline": round(qps / TARGET_QPS_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
