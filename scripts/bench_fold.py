"""Measure the r4 in-place device compact merge at config-#4 scale.

VERDICT r3 item 5: `merge_pending` on a device-resident arena used to fetch
the full payload to the host (9.6 GB at 12.5M×768/chip — ~1 s on real PCIe,
~7 min through this dev relay) and re-upload it. With `merge_headroom`, the
compact fold runs IN PLACE on device: zero payload fetch, bounded 192 MB
move temps (index/ivf_band.py::_try_merge_inplace_device).

Prints: build time, rows added, in-place fold wall time, a proof the arena
buffer capacity is unchanged (same-object donation chain), and a post-fold
self-retrieval check. Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fold.py

Env: N (default 12_500_000), ADD (default 131_072), HEADROOM (default 0.06).
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from cloudvectordb_tpu.index.ivf_band import BandIVFIndex

N = int(os.environ.get("N", 12_500_000))
ADD = int(os.environ.get("ADD", 131_072))
HEADROOM = float(os.environ.get("HEADROOM", 0.06))
D, LATENT, NCENTERS, NLIST = 768, 32, 256, int(os.environ.get("NLIST", 4096))
CHUNK = 500_000


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
    t0 = time.time()
    idx = BandIVFIndex.build_device_streaming(
        lambda i: gen(jax.random.PRNGKey(i), CHUNK), n_chunks,
        nlist=NLIST, kmeans_iters=10, residual=True,
        merge_headroom=HEADROOM)
    cap = int(idx._payload.shape[0])
    print(f"build {time.time()-t0:.1f}s n={idx.ntotal} cap_rows={cap} "
          f"(headroom {HEADROOM:.2f} → {cap - idx.ntotal} spare rows, "
          f"{(cap - idx.ntotal) * D / 2**20:.0f} MiB)", flush=True)

    new_rows = gen(jax.random.PRNGKey(777), ADD)
    idx.add(new_rows)  # pending (exact scan) — cheap
    t1 = time.time()
    idx.merge_pending()
    # fence: fold is donated device work; a tiny reduce over the arena tail
    fence = float(jnp.sum(idx._payload[-8:].astype(jnp.int32)))
    dt = time.time() - t1
    inplace = int(idx._payload.shape[0]) == cap
    print(f"fold {ADD} rows: {dt:.3f}s wall "
          f"({'IN-PLACE zero-fetch' if inplace else 'HOST fallback'}; "
          f"capacity {'unchanged' if inplace else 'resized'}; fence {fence})",
          flush=True)
    assert inplace, "expected the in-place path at this headroom"

    # post-fold correctness: the added rows retrieve themselves
    q = np.asarray(new_rows[:256])
    n_tiles = cap // idx.tile_n
    _, found = idx.search(q, 1, p_tiles=min(640, n_tiles), tile_q=64)
    self_hit = float((found[:, 0] >= N).mean())
    print(f"post-fold self-hit@1 (added rows) = {self_hit:.3f} "
          f"ntotal={idx.ntotal}", flush=True)


if __name__ == "__main__":
    main()
