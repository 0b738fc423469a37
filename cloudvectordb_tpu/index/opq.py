"""OPQ: learned orthogonal rotation before PQ (BASELINE config #5 "OPQ+IVF-PQ").

OPQ-NP alternating optimization (cf. PAPERS.md "Polysemous codes" lineage;
pattern reference only): iterate (a) PQ codebook fit on rotated data,
(b) encode/decode to get reconstructions, (c) orthogonal Procrustes solve
R = V·Uᵀ from SVD(Xᵀ·X̂). All linear algebra stays on device; SVD runs once
per outer iteration on a (D, D) matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cloudvectordb_tpu.index.pq import pq_decode, pq_encode, train_pq


def train_opq(
    x,
    m: int,
    nbits: int = 8,
    outer_iters: int = 8,
    pq_iters: int = 8,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Learn rotation + codebooks on sample x (N, D).

    Returns (R (D, D) f32 with x' = x @ R.T, codebooks (m, 2**nbits, D/m)).
    """
    x = jnp.asarray(x, jnp.float32)
    d = x.shape[1]
    r = jnp.eye(d, dtype=jnp.float32)
    codebooks = None
    for it in range(outer_iters):
        xr = x @ r.T
        codebooks = train_pq(xr, m, nbits, iters=pq_iters, seed=seed + it)
        codes = pq_encode(xr, codebooks)
        x_hat = pq_decode(codes, codebooks)
        # Procrustes: min_R ||x @ R.T - x_hat||  →  R = V Uᵀ of SVD(xᵀ x_hat)
        mcorr = x.T @ x_hat  # (D, D)
        u, _, vt = jnp.linalg.svd(mcorr, full_matrices=False)
        r = (u @ vt).T  # x @ r.T == (r @ xᵀ)ᵀ ; r = V Uᵀ
    return np.asarray(r), np.asarray(codebooks)


def opq_reconstruction_mse(x, r, codebooks) -> float:
    x = jnp.asarray(x, jnp.float32)
    xr = x @ jnp.asarray(r).T
    codes = pq_encode(xr, jnp.asarray(codebooks))
    x_hat = pq_decode(codes, jnp.asarray(codebooks))
    return float(jnp.mean(jnp.sum((xr - x_hat) ** 2, axis=1)))
