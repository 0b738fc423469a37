"""Deletion throughput at serving scale (r3): the flagship residual-int8
slack arena removes O(batch) IN PLACE — no rebuild, no host round-trip of
the multi-GB payload — and add() refills the freed slots.

Protocol (axon relay rules per eval/qps.py): data generated on device; the
remove path's device work is fenced with a one-row device_get; host
bookkeeping (the id-table scan + per-list planning) is inherently part of
the measured cost and is reported separately.

Env: N_ROWS (default 4M; 12_500_000 = config-#4 scale), NLIST (2048),
REMOVE_B (8192), SLACK (0.05).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_remove.py
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cloudvectordb_tpu.index.ivf_band import BandIVFIndex

D, K, LATENT, NCENTERS = 768, 10, 32, 256
N = int(os.environ.get("N_ROWS", 4_000_000))
CHUNK = int(os.environ.get("CHUNK", 500_000))
NLIST = int(os.environ.get("NLIST", 2048))
REMOVE_B = int(os.environ.get("REMOVE_B", 8192))
SLACK = float(os.environ.get("SLACK", 0.05))
NQ = 512


def main():
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

    n_chunks = N // CHUNK
    chunk_fn = lambda i: gen(jax.random.PRNGKey(i), CHUNK)

    t0 = time.perf_counter()
    idx = BandIVFIndex.build_device_streaming(
        chunk_fn, n_chunks, nlist=NLIST, kmeans_iters=10, residual=True,
        slack=SLACK)
    print(f"[build] {N}x{D} slack={SLACK} in "
          f"{time.perf_counter() - t0:.0f} s", flush=True)

    kq, kn = jax.random.split(jax.random.PRNGKey(7777))
    base = chunk_fn(0)
    sel = jax.random.randint(kq, (NQ,), 0, base.shape[0])
    q = base[sel] + (0.15 / (D ** 0.5)) * jax.random.normal(
        kn, (NQ, D), jnp.float32)
    q = np.asarray(q / jnp.linalg.norm(q, axis=1, keepdims=True))

    n_tiles = int(idx._payload.shape[0]) // idx.tile_n
    p = min(int(os.environ.get("P_TILES", 640)), n_tiles)
    _, g0 = idx.search(q, K, p_tiles=p)

    rng = np.random.default_rng(3)
    total_removed = 0
    t_host = t_all = 0.0
    rounds = int(os.environ.get("ROUNDS", 4))
    for r in range(rounds):
        live = np.asarray(idx._ids[: idx._n])
        live = live[live >= 0]
        victims = rng.choice(live, REMOVE_B, replace=False)
        t0 = time.perf_counter()
        nrem = idx.remove(victims)
        t1 = time.perf_counter()
        float(jnp.sum(idx._payload[0]))  # fence the device scatter
        t2 = time.perf_counter()
        assert nrem == REMOVE_B, (nrem, REMOVE_B)
        total_removed += nrem
        t_host += t1 - t0
        t_all += t2 - t0
        print(f"[remove {r}] {nrem} rows: host+dispatch {t1-t0:.3f} s, "
              f"fenced {t2-t0:.3f} s", flush=True)

    rate = total_removed / t_all
    print(f"[remove] {total_removed} rows in {t_all:.2f} s fenced "
          f"({rate:,.0f} rows/s; host share {t_host/t_all:.0%})", flush=True)

    # deleted ids never surface; survivors' results unchanged except where
    # a true neighbor was deleted
    _, g1 = idx.search(q, K, p_tiles=p)
    live_set = np.asarray(idx._ids[: idx._n])
    live_set = set(live_set[live_set >= 0].tolist())
    assert not any(int(x) not in live_set and int(x) < N
                   for x in g1.ravel()), "removed id surfaced"
    keep_rows = np.isin(g0, g1).mean()
    print(f"[post] ntotal {idx.ntotal}, top-{K} overlap with pre-remove: "
          f"{keep_rows:.3f}", flush=True)

    # refill: adds land in the freed slack slots in place
    t0 = time.perf_counter()
    idx.add(gen(jax.random.PRNGKey(9999), REMOVE_B))
    float(jnp.sum(idx._payload[0]))
    dt = time.perf_counter() - t0
    print(f"[refill] add {REMOVE_B} rows in {dt:.3f} s "
          f"(pending {idx._pending.size})", flush=True)
    assert idx.ntotal == N - total_removed + REMOVE_B


if __name__ == "__main__":
    main()
