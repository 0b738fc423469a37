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


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Phase-2 multi-slice scale-out over DCN (SURVEY.md §2.3 last row).

    Wraps jax.distributed.initialize; after this, jax.devices() spans all
    hosts and the same make_mesh/shard_map code runs across slices (XLA
    routes intra-slice collectives over ICI and inter-slice over DCN).
    Returns the global device count. No-op when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    return len(jax.devices())


def make_2d_mesh(n_replica: int, n_shard: int) -> Mesh:
    """('replica', 'shard') mesh for multi-slice serving: index rows sharded
    within a slice (ICI), whole-index replicas across slices (DCN) — query
    traffic splits across replicas, each query fans out over its slice."""
    devs = np.array(jax.devices()[: n_replica * n_shard]).reshape(
        n_replica, n_shard
    )
    return Mesh(devs, ("replica", "shard"))


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


def stage_row_sharded(piece_fn, n_shards: int, mesh: Mesh,
                      axis_name: str = "shard"):
    """Assemble a row-sharded global array from PER-SHARD host pieces without
    ever materializing the dense (S·rows, ...) host buffer: piece_fn(si)
    returns shard si's (rows, ...) numpy block (all equal shapes), which is
    placed directly on device si and stitched with
    make_array_from_single_device_arrays. Host peak = one piece at a time —
    at 100M-scale staging this halves host memory vs the dense concat.

    On a 2-D ('replica', 'shard') mesh each piece is placed on EVERY device
    of its shard column (index replicas across slices; one host→device copy
    per replica — on real multi-slice hardware each host stages its own).
    """
    import numpy as np

    sharding = NamedSharding(mesh, P(axis_name))
    if "replica" in mesh.axis_names:
        dev_grid = mesh.devices  # (n_replica, n_shard)
        # P('shard') splits dim0 over EVERY shard column — a partial cover
        # fails deep inside make_array_from_single_device_arrays
        assert dev_grid.shape[1] == n_shards, (dev_grid.shape, n_shards)
        cols = [list(dev_grid[:, si]) for si in range(n_shards)]
    else:
        cols = [[d] for d in list(mesh.devices.flat)[:n_shards]]
    arrs = []
    shape0 = None
    for si, col in enumerate(cols):
        piece = np.ascontiguousarray(piece_fn(si))
        if shape0 is None:
            shape0 = piece.shape
        assert piece.shape == shape0, (piece.shape, shape0)
        for d in col:
            arrs.append(jax.device_put(piece, d))
    global_shape = (n_shards * shape0[0], *shape0[1:])
    return jax.make_array_from_single_device_arrays(global_shape, sharding, arrs)
