"""On-chip correctness isolation for the tiles kernel + on-chip k-means.

A) tile-table honoring: db where row ids encode tile identity; pass a known
   table; check returned ids come from exactly those tiles.
B) on-chip k-means quality vs CPU-backend k-means on identical data.
C) coarse top-nprobe on chip vs oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, flush=True)


def main():
    from cloudvectordb_tpu.ops.pallas_band import tiles_topk_pallas

    # ---- A: tile table honoring ----
    TN, D, NT = 256, 128, 16
    n = TN * NT
    rng = np.random.default_rng(0)
    db = np.zeros((n, D), np.float32)
    # row r gets value r in dim 0 → top-1 for query [1,0,0...] is the max row
    db[:, 0] = np.arange(n) / n
    db[:, 1] = 1.0  # keep norms sane
    q = np.zeros((8, D), np.float32)
    q[:, 0] = 1.0
    table = jnp.asarray(np.array([[3, 7, 1, 2]], np.int32))  # only tiles 3,7,1,2
    v, i = tiles_topk_pallas(
        jnp.asarray(db), jnp.asarray(q), table, k=5, tile_n=TN, tile_q=8,
        l_buckets=256, int8=False,
    )
    ids = np.asarray(i)
    tiles_seen = sorted(set((ids // TN).flatten().tolist()))
    log(f"A: expected tiles ⊆ {{1,2,3,7}}, got tiles {tiles_seen}")
    log(f"A: top ids {ids[0]} (expect from tile 7: rows {7*TN}..{8*TN-1})")

    # ---- B: k-means on chip vs expected objective ----
    from cloudvectordb_tpu.index.kmeans import train_kmeans, kmeans_objective

    @jax.jit
    def mkx(key):
        kc, ka, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (32, D), jnp.float32)
        a = jax.random.randint(ka, (20000,), 0, 32)
        return centers[a] + 0.1 * jax.random.normal(kn, (20000, D), jnp.float32)

    x = mkx(jax.random.PRNGKey(1))
    c, a = train_kmeans(x, 32, iters=10, seed=0)
    obj = float(kmeans_objective(x, c, a))
    var = float(jnp.mean(jnp.sum((x - jnp.mean(x, 0)) ** 2, 1)))
    counts = np.bincount(np.asarray(a), minlength=32)
    log(f"B: kmeans obj {obj:.3f} vs var {var:.3f} (ratio {obj/var:.3f}; "
        f"good clustering ≪ 1); nonempty {int((counts > 0).sum())}/32")

    # ---- C: coarse probing on chip ----
    from cloudvectordb_tpu.ops.topk import tiled_topk

    xq = x[:64] + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (64, D))
    _, probed = tiled_topk(c, xq, 4, metric="ip", tile=32)
    a_q, _ = jax.vmap(lambda row: (jnp.argmax(row @ c.T), 0))(xq)
    hit = float(jnp.mean(jnp.any(probed == a_q[:, None], axis=1)))
    log(f"C: top-4 probe contains argmax centroid for {hit:.2%} of queries")


if __name__ == "__main__":
    main()
