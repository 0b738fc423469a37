"""Product quantization: codebook training, encode, decode (SURVEY.md §2.2).

Training is m independent sub-space k-means runs, vmapped so all sub-spaces
optimize simultaneously on the MXU (BASELINE config #3: m=64, nbits=8).

TPU-first note: decode is expressed as one-hot matmuls when on the hot path
(see ops/pq_score.py); the gather-based decode here is for build/test paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cloudvectordb_tpu.index.kmeans import train_kmeans
from cloudvectordb_tpu.ops.assign import assign_clusters


def _split(x, m: int):
    """(N, D) -> (m, N, D/m) sub-vectors."""
    n, d = x.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    return jnp.transpose(x.reshape(n, m, d // m), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("m", "nbits", "iters"))
def train_pq(x, m: int, nbits: int = 8, iters: int = 12, seed: int = 0):
    """Train codebooks (m, 2**nbits, D/m) f32 on training vectors x (N, D)."""
    ncode = 2 ** nbits
    subs = _split(x, m)  # (m, N, dsub)

    def one(sub, s):
        c, _ = train_kmeans(sub, ncode, iters=iters, seed=s, tile=4096)
        return c

    seeds = seed + jnp.arange(m)
    return jax.vmap(one)(subs, seeds)


@functools.partial(jax.jit, static_argnames=())
def pq_encode(x, codebooks):
    """(N, D) -> uint8 codes (N, m)."""
    m = codebooks.shape[0]
    subs = _split(x, m)  # (m, N, dsub)

    def one(sub, cb):
        a, _ = assign_clusters(sub, cb, tile=8192)
        return a

    codes = jax.vmap(one)(subs, codebooks)  # (m, N)
    return jnp.transpose(codes).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=())
def pq_decode(codes, codebooks):
    """uint8 (N, m) -> reconstructed (N, D) f32 (gather path, off hot loop)."""
    m, ncode, dsub = codebooks.shape
    parts = jax.vmap(lambda j: codebooks[j][codes[:, j].astype(jnp.int32)])(
        jnp.arange(m)
    )  # (m, N, dsub)
    return jnp.transpose(parts, (1, 0, 2)).reshape(codes.shape[0], m * dsub)


def pq_reconstruction_mse(x, codebooks) -> float:
    codes = pq_encode(x, codebooks)
    xr = pq_decode(codes, codebooks)
    return float(jnp.mean(jnp.sum((x - xr) ** 2, axis=1)))
