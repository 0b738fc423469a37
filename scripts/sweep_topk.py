"""On-chip tile sweep for the fused top-k kernels (run on real TPU).

Reports ms/batch and QPS for bf16 and int8 variants across tile configs,
plus dispatch-overhead measurement (empty jit) to separate tunnel RTT from
kernel time.
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cloudvectordb_tpu.ops.pallas_topk import flat_topk_pallas, flat_topk_pallas_int8

N, D, K, B = 1_000_000, 768, 10, 1024


def timeit(fn, iters=5, nvariants=4, rtt=0.0):
    """fn(i) must RETURN a float computed from the result (device_get is the
    only true fence under the axon tunnel — block_until_ready does not block).
    Distinct input variants per call defeat relay-level result caching."""
    fn(0)  # compile
    fn(1)
    t0 = time.perf_counter()
    for i in range(iters):
        fn(2 + (i % nvariants))
    return max((time.perf_counter() - t0) / iters - rtt, 1e-9)


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk(key):
        k1, k2 = jax.random.split(key)
        db = jax.random.normal(k1, (N, D), jnp.float32)
        db /= jnp.linalg.norm(db, axis=1, keepdims=True)
        q = jax.random.normal(k2, (B, D), jnp.float32)
        q /= jnp.linalg.norm(q, axis=1, keepdims=True)
        return db.astype(jnp.bfloat16), q.astype(jnp.bfloat16)

    db, q0 = jax.block_until_ready(mk(key))
    db_i8 = jax.block_until_ready(
        jnp.clip(jnp.round(db.astype(jnp.float32) * 127), -127, 127).astype(jnp.int8)
    )
    # distinct query variants — the axon relay caches results of identical
    # (executable, args) pairs, so repeating one input measures the cache
    qs = [
        jax.block_until_ready(
            (
                q0.astype(jnp.float32)
                + 0.001 * jax.random.normal(jax.random.PRNGKey(10 + i), q0.shape)
            ).astype(jnp.bfloat16)
        )
        for i in range(8)
    ]
    qfs = [qq.astype(jnp.float32) for qq in qs]

    # fetch RTT (fixed overhead to subtract from every measurement)
    f = jax.jit(lambda x: jnp.sum(x[:1, :8]))
    rtt = timeit(lambda i: float(f(qs[i % 8])), iters=10, nvariants=6)
    print(f"fetch RTT: {rtt * 1000:.2f} ms")

    for tq, tn, lb in itertools.product((256, 512), (1024, 2048), (512, 1024)):
        if tn % lb:
            continue
        try:
            fn = lambda i: float(  # noqa: E731
                jnp.sum(flat_topk_pallas(db, qs[i % 8], K, metric="ip", tile_n=tn, tile_q=tq, l_buckets=lb)[0])
            )
            dt = timeit(fn, rtt=rtt)
            print(f"bf16 tq={tq} tn={tn} L={lb}: {dt*1000:7.2f} ms  {B/dt:9.0f} qps")
        except Exception as e:
            print(f"bf16 tq={tq} tn={tn} L={lb}: FAIL {str(e)[:80]}")

    for tq, tn in itertools.product((256, 512), (1024, 2048)):
        try:
            fn = lambda i: float(  # noqa: E731
                jnp.sum(flat_topk_pallas_int8(db_i8, 1 / 127.0, qfs[i % 8], K, tile_n=tn, tile_q=tq)[0])
            )
            dt = timeit(fn, rtt=rtt)
            print(f"int8 tq={tq} tn={tn}: {dt*1000:7.2f} ms  {B/dt:9.0f} qps")
        except Exception as e:
            print(f"int8 tq={tq} tn={tn}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()
