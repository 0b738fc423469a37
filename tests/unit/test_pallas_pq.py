"""Fused PQ-scan kernel vs explicit decode + exact top-k."""

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.index.pq import pq_decode, pq_encode, train_pq
from cloudvectordb_tpu.ops.pallas_pq import pq_topk_pallas


def test_pq_scan_matches_decoded_oracle():
    m, nbits = 8, 5
    db = clustered_vectors(3000, 64, seed=50)
    q = queries_from(db, 16, seed=51)
    cb = train_pq(jnp.asarray(db), m, nbits, iters=8)
    codes = pq_encode(jnp.asarray(db), cb)  # (N, m)
    decoded = np.asarray(pq_decode(codes, cb))

    s, i = pq_topk_pallas(
        jnp.transpose(codes), cb, jnp.asarray(q), k=10,
        tile_n=512, tile_q=16, l_buckets=512, interpret=True,
    )
    # oracle: exact IP top-k over the decoded reconstructions
    s_true, i_true = brute_force_topk(decoded, q, 10, metric="ip")
    r = recall_at_k(np.asarray(i), i_true)
    assert r >= 0.9, r  # bucketed merge bound
    # scores must equal reconstruction IPs (bf16 tolerance)
    found = np.asarray(i)
    for row in range(4):
        ip = q[row] @ decoded[found[row]].T
        np.testing.assert_allclose(np.asarray(s)[row], ip, rtol=2e-2, atol=2e-2)
