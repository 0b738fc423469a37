"""Query-throughput measurement (SURVEY.md §5.1).

Fencing: on a directly-attached TPU, ``jax.block_until_ready`` is a correct
fence. Behind a remote-execution relay (the axon dev tunnel),
block_until_ready returns immediately — the only true fence is a device_get
of a scalar that depends on all timed work. ``qps_bench`` therefore reduces
every batch's scores into one accumulator and fetches it once per iteration,
subtracting the separately-measured fetch RTT.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def measure_fetch_rtt(iters: int = 5) -> float:
    """Fixed cost of one device_get round trip."""
    f = jax.jit(lambda x: jnp.sum(x))
    small = jnp.ones((8, 128))
    float(f(small))  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        float(f(small + i))
    return (time.perf_counter() - t0) / iters


def device_seconds(step_fn, *args, reps: int = 64) -> float:
    """True per-step DEVICE time of ``step_fn`` by differential fold.

    ``step_fn(i, *args) -> f32 scalar`` (i: traced int32 step index; fold
    its value into the returned scalar so no step is dead-code-eliminated;
    vary the computation's *inputs* by ``i`` — e.g. a dynamic slice — so a
    caching relay can't serve repeated identical dispatches). The fold jits
    ONE ``lax.fori_loop`` with a *dynamic* rep count, times it at R and 2R
    reps, and returns (wall₂ᵣ − wallᵣ)/R — the relay RTT, dispatch overhead
    and the final scalar fetch cancel exactly in the subtraction. This is
    the methodology behind every small-workload device number in the bench
    scripts (scripts/bench_latency.py measured 0.45 ms at B=1 where raw
    wall time through the dev tunnel was ~40–130 ms RTT-bound).

    Big arrays must ride as ``args`` — closure capture would bake them into
    the HLO as constants (shipped whole to a remote compiler).
    """
    def fold(nreps, *a):
        def body(i, acc):
            return acc + step_fn(i, *a)
        return jax.lax.fori_loop(0, nreps, body, jnp.float32(0))

    folded = jax.jit(fold)
    float(folded(jnp.int32(2), *args))  # compile + warm
    t0 = time.perf_counter()
    float(folded(jnp.int32(reps), *args))
    w1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(folded(jnp.int32(2 * reps), *args))
    w2 = time.perf_counter() - t0
    return max((w2 - w1) / reps, 1e-9)


def qps_bench(
    search_fn: Callable,
    queries,
    *,
    batch: int | None = None,
    warmup: int = 1,
    iters: int = 3,
    score_index: int = 0,
) -> dict:
    """Measure steady-state queries/second of a device-level search fn.

    ``search_fn(queries_batch)`` must return device arrays (a (scores, ids)
    tuple by default; ``score_index`` selects the fenced output).
    """
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    if batch is None:
        batch = nq

    def run_once(noise: float) -> float:
        acc = jnp.float32(0)
        for s in range(0, nq, batch):
            out = search_fn(queries[s : s + batch] + jnp.asarray(noise, queries.dtype))
            scores = out[score_index] if isinstance(out, (tuple, list)) else out
            acc = acc + jnp.sum(scores.astype(jnp.float32))
        return float(acc)  # device_get: the fence

    for w in range(warmup):
        run_once(0.0)
    rtt = measure_fetch_rtt()
    t0 = time.perf_counter()
    for i in range(iters):
        run_once(1e-4 * (i + 1))  # distinct inputs defeat relay result caching
    raw = time.perf_counter() - t0
    # when device time ≈ RTT (tiny workloads) the subtraction collapses to
    # noise and qps diverges; in that regime report the RAW end-to-end rate
    # as `qps` (a lower bound — never an inflated synthetic figure) and set
    # rtt_bound so callers know the device-time estimate saturated.
    rtt_bound = raw - rtt * iters < 0.05 * raw
    dt = raw if rtt_bound else raw - rtt * iters
    qps = nq * iters / dt
    return {
        "qps": qps,
        "qps_raw": nq * iters / raw,  # end-to-end incl. relay RTT, always
        "rtt_bound": bool(rtt_bound),
        "latency_ms": 1000.0 * dt / (iters * max(1, nq // batch)),
        "batch": batch,
        "fetch_rtt_ms": rtt * 1000.0,
    }
