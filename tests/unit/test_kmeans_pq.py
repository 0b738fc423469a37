"""k-means and PQ quantizer training vs numpy references / invariants."""

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.data.synthetic import clustered_vectors
from cloudvectordb_tpu.index.kmeans import kmeans_objective, train_kmeans
from cloudvectordb_tpu.index.pq import (
    pq_decode,
    pq_encode,
    pq_reconstruction_mse,
    train_pq,
)
from cloudvectordb_tpu.index.opq import opq_reconstruction_mse, train_opq


def _numpy_lloyd(x, c, iters):
    for _ in range(iters):
        d = ((x[:, None] - c[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(len(c)):
            if (a == j).any():
                c[j] = x[a == j].mean(0)
    return c


def test_kmeans_reduces_objective_and_beats_init():
    x = clustered_vectors(2000, 16, n_clusters=8, seed=20)
    xj = jnp.asarray(x)
    c0, a0 = train_kmeans(xj, 8, iters=0, seed=0)
    c, a = train_kmeans(xj, 8, iters=15, seed=0)
    obj0 = float(kmeans_objective(xj, c0, a0))
    obj = float(kmeans_objective(xj, c, a))
    assert obj < obj0 * 0.9
    # close to a numpy Lloyd's run from the same init
    c_np = _numpy_lloyd(x.astype(np.float64), np.asarray(c0).astype(np.float64), 15)
    d = ((x[:, None] - c_np[None]) ** 2).sum(-1)
    obj_np = d.min(1).mean()
    assert obj <= obj_np * 1.15


def test_kmeans_no_empty_clusters_on_clustered_data():
    x = clustered_vectors(512, 8, n_clusters=4, seed=21)
    c, a = train_kmeans(jnp.asarray(x), 16, iters=10, seed=1)
    counts = np.bincount(np.asarray(a), minlength=16)
    assert (counts > 0).sum() >= 12  # repair keeps nearly all alive


def test_pq_roundtrip_reduces_error():
    x = clustered_vectors(4096, 32, seed=22)
    cb = train_pq(jnp.asarray(x), m=8, nbits=4, iters=8)
    assert cb.shape == (8, 16, 4)
    codes = pq_encode(jnp.asarray(x), cb)
    assert codes.shape == (4096, 8) and codes.dtype == jnp.uint8
    xr = np.asarray(pq_decode(codes, cb))
    mse = ((x - xr) ** 2).sum(1).mean()
    var = (x ** 2).sum(1).mean()
    assert mse < 0.35 * var  # quantizer must explain most of the variance


def test_pq_encode_matches_numpy_argmin():
    x = clustered_vectors(256, 16, seed=23)
    cb = train_pq(jnp.asarray(x), m=4, nbits=3, iters=5)
    codes = np.asarray(pq_encode(jnp.asarray(x), cb))
    cbn = np.asarray(cb)
    for j in range(4):
        sub = x[:, j * 4 : (j + 1) * 4]
        d = ((sub[:, None] - cbn[j][None]) ** 2).sum(-1)
        chosen = d[np.arange(len(x)), codes[:, j]]
        np.testing.assert_allclose(chosen, d.min(1), rtol=1e-4, atol=1e-5)


def test_opq_beats_plain_pq():
    # correlated dims: rotation should help
    rng = np.random.default_rng(24)
    z = rng.normal(size=(4096, 8)).astype(np.float32)
    mix = rng.normal(size=(8, 32)).astype(np.float32)
    x = z @ mix + 0.01 * rng.normal(size=(4096, 32)).astype(np.float32)
    r, cb = train_opq(x, m=8, nbits=4, outer_iters=4, pq_iters=6)
    # rotation is orthogonal
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-3)
    mse_opq = opq_reconstruction_mse(x, r, cb)
    mse_pq = pq_reconstruction_mse(jnp.asarray(x), train_pq(jnp.asarray(x), 8, 4, iters=6))
    assert mse_opq <= mse_pq * 1.05  # at worst on par, usually better


def test_aniso_pq_eta1_is_lloyd():
    """eta=1 collapses the anisotropic loss to plain L2: assignment is the
    L2 argmin and the normal equations reduce to the cluster mean, so the
    trained quantizer's MSE must match plain PQ's closely."""
    from cloudvectordb_tpu.index.pq import pq_encode_aniso, train_pq_aniso

    x = clustered_vectors(4096, 32, seed=30)
    xj = jnp.asarray(x)
    cb_p = train_pq(xj, m=8, nbits=4, iters=8)
    cb_a = train_pq_aniso(xj, xj, m=8, nbits=4, iters=8, eta=1.0)
    mse_p = pq_reconstruction_mse(xj, cb_p)
    codes = pq_encode_aniso(xj, xj, cb_a, eta=1.0)
    xr = np.asarray(pq_decode(codes, cb_a))
    mse_a = ((x - xr) ** 2).sum(1).mean()
    assert mse_a <= mse_p * 1.1, (mse_a, mse_p)


def test_aniso_pq_trades_parallel_for_orthogonal_error():
    """The defining property: eta>1 must cut the score-direction (parallel)
    reconstruction error vs plain PQ, paying with a (bounded) increase in
    total MSE. Parallel error is what perturbs IP scores."""
    from cloudvectordb_tpu.index.pq import pq_encode_aniso, train_pq_aniso

    x = clustered_vectors(8192, 32, n_clusters=16, seed=31, normalize=True)
    xj = jnp.asarray(x)

    def par_err(cb, codes):
        xr = np.asarray(pq_decode(codes, cb))
        e = x - xr
        u = x / np.linalg.norm(x, axis=1, keepdims=True)
        return float(((e * u).sum(1) ** 2).mean()), float((e ** 2).sum(1).mean())

    cb_p = train_pq(xj, m=8, nbits=4, iters=8)
    par_p, mse_p = par_err(cb_p, pq_encode(xj, cb_p))
    cb_a = train_pq_aniso(xj, xj, m=8, nbits=4, iters=8, eta=6.0)
    par_a, mse_a = par_err(
        cb_a, pq_encode_aniso(xj, xj, cb_a, eta=6.0))
    assert par_a < par_p * 0.8, (par_a, par_p)  # big parallel-error cut
    assert mse_a < mse_p * 3.0, (mse_a, mse_p)  # bounded total-MSE cost


def test_kmeans_more_clusters_than_points():
    """k > N must not crash (tiny corpora with 2^nbits PQ codebooks):
    init cycles jittered rows and shapes stay (k, D)."""
    x = clustered_vectors(40, 8, n_clusters=4, seed=33)
    c, a = train_kmeans(jnp.asarray(x), 64, iters=5, seed=0)
    assert c.shape == (64, 8) and a.shape == (40,)
    assert int(a.max()) < 64 and np.isfinite(np.asarray(c)).all()
    cb = train_pq(jnp.asarray(x), m=2, nbits=8, iters=3)  # ncode=256 > 40
    assert cb.shape == (2, 256, 4)
