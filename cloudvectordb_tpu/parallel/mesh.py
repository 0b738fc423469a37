"""Mesh construction + sharding specs (SURVEY.md §2.3).

Axes:
  'data'  — batch axis for training / encoding (DP);
  'shard' — database axis for the index (the vectordb analog of TP): index
            rows live sharded across HBM, queries are broadcast over ICI.

TP/PP for the encoder are deliberately absent: MiniLM-class models fit on one
v5e chip; splitting them would add ICI latency for nothing (SURVEY.md §2.3,
documented decision).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n visible devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(x, mesh: Mesh, axis_name: str = "shard"):
    """Place (N, ...) array row-sharded over the mesh, padding N to a multiple
    of the axis size. Returns (sharded array, original N)."""
    import jax.numpy as jnp

    n = x.shape[0]
    size = mesh.shape[axis_name]
    pad = (-n) % size
    if pad:
        x = jnp.concatenate([jnp.asarray(x), jnp.zeros((pad, *x.shape[1:]), x.dtype)])
    return jax.device_put(x, NamedSharding(mesh, P(axis_name))), n
