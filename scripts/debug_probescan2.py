"""Probe-scan vs PQ ceiling vs nprobe scaling, chip vs CPU, structured data."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N, D, NLIST, M, K, B = 30_000, 256, 64, 32, 10, 64


def main():
    from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
    from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
    from cloudvectordb_tpu.index.ivf_pq import IVFPQIndex, _ivfpq_scan_search
    from cloudvectordb_tpu.index.pq import pq_decode

    db = clustered_vectors(N, D, n_clusters=48, seed=150, normalize=True)
    q = queries_from(db, B, seed=151, normalize=True)
    _, gt = brute_force_topk(db, q, K, metric="ip")

    idx = IVFPQIndex.build(db, nlist=NLIST, m=M, nbits=8, metric="ip",
                           kmeans_iters=8, pq_train_iters=6)
    idx.merge_pending()
    ar = idx._arena
    # PQ ceiling
    rhat = np.asarray(pq_decode(jnp.asarray(ar.payload), jnp.asarray(idx.codebooks)))
    lists = np.repeat(np.arange(idx.nlist), ar.list_lens)
    xhat = rhat + idx.centroids[lists]
    xhat_by_id = np.empty_like(xhat)
    xhat_by_id[ar.ids] = xhat
    _, ceil_ids = brute_force_topk(xhat_by_id, q, K, metric="ip")
    print(f"PQ ceiling recall: {recall_at_k(ceil_ids, gt):.4f}", flush=True)

    args = lambda npb: dict(k=K, nprobe=npb, cap=ar.max_list_len,  # noqa: E731
                            metric="ip", residual=True)
    for dev_name, dev in (("cpu", jax.devices("cpu")[0]), ("tpu", jax.devices()[0])):
        put = lambda x: jax.device_put(jnp.asarray(x), dev)  # noqa: E731
        for npb in (8, 32):
            v, rows = _ivfpq_scan_search(
                put(q), put(idx.centroids), put(ar.payload),
                put(ar.offsets[:-1].astype(np.int32)),
                put(ar.list_lens.astype(np.int32)),
                put(idx.codebooks), **args(npb),
            )
            r = recall_at_k(ar.ids[jax.device_get(rows)], gt)
            print(f"{dev_name} nprobe={npb}: recall {r:.4f}", flush=True)


if __name__ == "__main__":
    main()
