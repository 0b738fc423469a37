"""adc_scan exactness vs decoded oracle; pairs-based mining."""

import json

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.data.triplets import (
    Triplets,
    load_pairs,
    mine_triplets_from_pairs,
)
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k
from cloudvectordb_tpu.index.ivf_pq import _build_luts
from cloudvectordb_tpu.index.pq import pq_decode, pq_encode, train_pq
from cloudvectordb_tpu.ops.adc import adc_scan
from cloudvectordb_tpu.utils.config import MiningConfig


def test_adc_scan_matches_decoded_exact():
    db = clustered_vectors(2000, 32, seed=110)
    q = queries_from(db, 8, seed=111)
    cb = train_pq(jnp.asarray(db), m=8, nbits=5, iters=6)
    codes = pq_encode(jnp.asarray(db), cb)
    decoded = np.asarray(pq_decode(codes, cb))
    luts = _build_luts(jnp.asarray(q), cb, "ip")
    s, i = adc_scan(codes, luts, k=10, tile=512)
    s_true, i_true = brute_force_topk(decoded, q, 10, metric="ip")
    assert recall_at_k(np.asarray(i), i_true) >= 0.99  # exact up to fp ties
    np.testing.assert_allclose(np.asarray(s)[:, 0], s_true[:, 0], rtol=2e-2)


def test_pairs_mining(tmp_path):
    pairs = [(f"question {i} about topic {i % 5}", f"answer doc {i} topic {i % 5}")
             for i in range(50)]
    p = tmp_path / "pairs.jsonl"
    with p.open("w") as fh:
        for q, pos in pairs:
            fh.write(json.dumps({"query": q, "positive": pos}) + "\n")
    qs, ps = load_pairs(p)
    assert len(qs) == 50
    trip = mine_triplets_from_pairs(qs, ps, MiningConfig(num_triplets=30, seed=1))
    assert len(trip) == 30
    for a, pos, neg in zip(trip.anchors, trip.positives, trip.negatives):
        assert a.startswith("question")
        assert pos.startswith("answer")
        assert neg != pos
