"""The oracle itself must be right: cross-check against naive full-matrix numpy."""

import numpy as np

from cloudvectordb_tpu.data.synthetic import clustered_vectors, queries_from
from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k


def _naive_topk(db, q, k, metric):
    if metric == "ip":
        s = q.astype(np.float64) @ db.astype(np.float64).T
    else:
        d = (
            (q.astype(np.float64) ** 2).sum(1)[:, None]
            - 2 * q.astype(np.float64) @ db.astype(np.float64).T
            + (db.astype(np.float64) ** 2).sum(1)[None, :]
        )
        s = -d
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_brute_force_matches_naive_ip():
    db = clustered_vectors(500, 32, seed=0)
    q = queries_from(db, 20, seed=1)
    s, i = brute_force_topk(db, q, 10, metric="ip", block=128)
    s2, i2 = _naive_topk(db, q, 10, "ip")
    np.testing.assert_allclose(s, s2, rtol=1e-10)
    assert recall_at_k(i, i2) == 1.0


def test_brute_force_matches_naive_l2():
    db = clustered_vectors(300, 16, seed=2)
    q = queries_from(db, 10, seed=3)
    s, i = brute_force_topk(db, q, 5, metric="l2", block=64)
    s2, i2 = _naive_topk(db, q, 5, "l2")
    np.testing.assert_allclose(s, s2, rtol=1e-9)
    assert recall_at_k(i, i2) == 1.0


def test_recall_partial():
    true = np.array([[1, 2, 3, 4]])
    found = np.array([[1, 2, 9, 8]])
    assert recall_at_k(found, true) == 0.5
