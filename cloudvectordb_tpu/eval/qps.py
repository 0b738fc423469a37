"""Query-throughput measurement with block_until_ready fences (SURVEY.md §5.1)."""

from __future__ import annotations

import time
from typing import Callable

import jax


def qps_bench(
    search_fn: Callable,
    queries,
    *,
    batch: int | None = None,
    warmup: int = 2,
    iters: int = 5,
) -> dict:
    """Measure steady-state queries/second of a (possibly jitted) search fn.

    ``search_fn(queries_batch)`` must return device arrays; we fence with
    ``jax.block_until_ready`` so compile time and dispatch pipelining don't
    flatter the number.
    """
    nq = queries.shape[0]
    if batch is None:
        batch = nq

    def run_once():
        outs = []
        for s in range(0, nq, batch):
            outs.append(search_fn(queries[s : s + batch]))
        jax.block_until_ready(outs)

    for _ in range(warmup):
        run_once()
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = time.perf_counter() - t0
    qps = nq * iters / dt
    return {"qps": qps, "latency_ms": 1000.0 * dt / (iters * max(1, nq // batch)), "batch": batch}
