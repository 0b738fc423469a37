"""Chip-vs-CPU differential for _ivfpq_scan_search on identical small data.

CPU tests pass; on-chip recall was 0.17 at 250k. Isolate: same arrays, same
static args, compare chip output to CPU-backend output elementwise.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, D, NLIST, M, K, B, CAP_PAD = 20_000, 64, 32, 8, 10, 16, 0


def main():
    from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
    from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
    from cloudvectordb_tpu.index.ivf_pq import IVFPQIndex, _ivfpq_scan_search

    db = clustered_vectors(N, D, n_clusters=24, seed=140, normalize=True)
    q = queries_from(db, B, seed=141, normalize=True)
    _, gt = brute_force_topk(db, q, K, metric="ip")

    idx = IVFPQIndex.build(db, nlist=NLIST, m=M, nbits=6, metric="ip",
                           kmeans_iters=6, pq_train_iters=6)
    st = idx._device_state()
    args = dict(k=K, nprobe=8, cap=st["cap"], metric="ip", residual=True)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print(f"backends: default={jax.default_backend()}, cap={st['cap']}", flush=True)

    outs = {}
    for name, dev in (("tpu", tpu), ("cpu", cpu)):
        put = lambda x: jax.device_put(jnp.asarray(x), dev)  # noqa: E731
        v, rows = _ivfpq_scan_search(
            put(q), put(idx.centroids), put(idx._arena.payload),
            put(idx._arena.offsets[:-1].astype(np.int32)),
            put(idx._arena.list_lens.astype(np.int32)),
            put(idx.codebooks), **args,
        )
        i = idx._arena.ids[jax.device_get(rows)]  # rows → global ids (r3)
        outs[name] = (jax.device_get(v), i)
        r = recall_at_k(outs[name][1], gt)
        print(f"{name}: recall@10={r:.4f}  ids[0]={outs[name][1][0][:5]}  "
              f"v[0]={np.round(outs[name][0][0][:5], 3)}", flush=True)

    dv = np.abs(outs["tpu"][0] - outs["cpu"][0]).max()
    same = (outs["tpu"][1] == outs["cpu"][1]).mean()
    print(f"max |Δscore| = {dv:.4f}; id agreement = {same:.2%}", flush=True)


if __name__ == "__main__":
    main()
