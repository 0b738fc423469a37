"""Multi-host worker: one PROCESS of the simulated-DCN serving test.

Launched by test_multihost.py (N processes over TCP, gloo collectives,
M simulated CPU devices each — the executable stand-in for N hosts of an
N×M TPU slice). Builds the sharded serving index, searches, and dumps the
result ids for the parent test to compare against the single-process mesh.

Not a pytest module (underscore prefix keeps it out of collection).
"""

import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    local_devices = 8 // nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cloudvectordb_tpu.parallel.mesh import (
        init_multihost, make_2d_mesh, make_mesh)

    n = init_multihost(f"127.0.0.1:{port}", nproc, pid,
                       cpu_collectives="gloo")
    assert n == 8, n
    assert jax.process_count() == nproc

    import numpy as np

    from cloudvectordb_tpu.data.synthetic import (
        clustered_vectors, queries_from)
    from cloudvectordb_tpu.parallel.dist_band import ShardedBandIndex

    db = clustered_vectors(1024, 32, n_clusters=16, seed=50, normalize=True)
    q = queries_from(db, 32, seed=51, normalize=True)
    kw = dict(dtype="int8", residual=True, kmeans_iters=4, tile_n=128,
              tile_q=8, seed=5)

    # (a) 1-D 'shard' mesh spanning both processes: every host passes the
    # same broadcast batch; the partial-top-k merge all_gather crosses the
    # process boundary (the DCN hop).
    idx = ShardedBandIndex.build(db, nlist=8,
                                 mesh=make_mesh(axis_name="shard"), **kw)
    st = idx._device_state()
    _, ids = idx.search(q, 5, p_tiles=int(st["n_tiles"]))
    np.save(os.path.join(outdir, f"oned_{pid}.npy"), ids)

    # (b) ('replica', 'shard') mesh, one replica per process: each host
    # stages a full index copy and serves ITS OWN traffic slice — queries
    # never cross hosts, only the staging collective does.
    idx2 = ShardedBandIndex.build(
        db, nlist=8, mesh=make_2d_mesh(nproc, 8 // nproc), **kw)
    st2 = idx2._device_state()
    qslice = q[pid * 16:(pid + 1) * 16]
    _, ids2 = idx2.search(qslice, 5, p_tiles=int(st2["n_tiles"]))
    np.save(os.path.join(outdir, f"twod_{pid}.npy"), ids2)
    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
