"""Is 2-D scalar-prefetch indexing tt[i, j] honored per query tile on chip?

db rows encode their tile id; two query tiles get DISJOINT tile tables; if
indexing works, each query tile's results come only from its own tiles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.ops.pallas_band import tiles_topk_pallas

TN, D, NT, TQ = 256, 128, 16, 8
n = TN * NT


def main():
    db = np.zeros((n, D), np.float32)
    db[:, 0] = np.arange(n) / n  # row score encodes row id
    q = np.zeros((2 * TQ, D), np.float32)
    q[:, 0] = 1.0
    # query tile 0 → tiles {2,3}; query tile 1 → tiles {10,11}
    table = jnp.asarray(np.array([[2, 3], [10, 11]], np.int32))
    v, i = tiles_topk_pallas(
        jnp.asarray(db), jnp.asarray(q), table, k=4, tile_n=TN, tile_q=TQ,
        l_buckets=256, int8=False,
    )
    ids = np.asarray(i)
    t0 = sorted(set((ids[:TQ] // TN).flatten().tolist()))
    t1 = sorted(set((ids[TQ:] // TN).flatten().tolist()))
    print(f"qt0 tiles (want [2,3] top=3): {t0}; top ids {ids[0]}", flush=True)
    print(f"qt1 tiles (want [10,11] top=11): {t1}; top ids {ids[TQ]}", flush=True)
    ok = set(t0) <= {2, 3} and set(t1) <= {10, 11}
    print("2-D scalar prefetch indexing:", "OK" if ok else "BROKEN", flush=True)


if __name__ == "__main__":
    main()
