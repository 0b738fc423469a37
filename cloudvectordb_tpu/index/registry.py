"""Index factory + polymorphic load (dispatch on the saved manifest kind)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from cloudvectordb_tpu.index.base import Index
from cloudvectordb_tpu.index.flat import FlatIndex
from cloudvectordb_tpu.index.ivf_band import BandIVFIndex, BandIVFPQIndex
from cloudvectordb_tpu.index.ivf_flat import IVFFlatIndex
from cloudvectordb_tpu.index.ivf_pq import IVFPQIndex
from cloudvectordb_tpu.utils.config import IndexConfig

_KINDS = {
    "flat": FlatIndex,
    "ivf_flat": IVFFlatIndex,
    "ivf_pq": IVFPQIndex,
    "band_ivf": BandIVFIndex,
    "band_ivf_pq": BandIVFPQIndex,
}


def build_index(vectors, cfg: IndexConfig) -> Index:
    """Build any index kind from vectors + config (trains quantizers inline).

    cfg.nshards > 0 builds the row-partitioned SHARDED wrapper over a 1-D
    'shard' mesh of that many devices (band_ivf and ivf_pq kinds) — the
    config-#4 serving topology, reachable from the CLI build stage."""
    vectors = np.asarray(vectors, np.float32)
    if cfg.nshards > 0:
        from cloudvectordb_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.nshards, axis_name="shard")
        nlist = min(cfg.nlist, max(1, vectors.shape[0] // 4))
        if cfg.kind == "band_ivf":
            from cloudvectordb_tpu.parallel.dist_band import ShardedBandIndex

            dtype = cfg.dtype if cfg.dtype != "float32" else "int8"
            resid = cfg.residual and dtype == "int8"
            return ShardedBandIndex.build(
                vectors, nlist, mesh=mesh, train_sample=cfg.train_sample,
                dtype=dtype, residual=resid,
                slack=(cfg.slack if resid else 0.0),
                kmeans_iters=cfg.kmeans_iters, seed=cfg.seed,
                metric=cfg.metric,
            )
        if cfg.kind == "ivf_pq":
            from cloudvectordb_tpu.parallel.dist_ivf import ShardedIVFPQIndex

            return ShardedIVFPQIndex.build(
                vectors, nlist, m=cfg.m, mesh=mesh, nbits=cfg.nbits,
                metric=cfg.metric, refine=cfg.refine,
                train_sample=cfg.train_sample, kmeans_iters=cfg.kmeans_iters,
                pq_train_iters=cfg.pq_train_iters, seed=cfg.seed,
            )
        if cfg.kind == "band_ivf_pq":
            from cloudvectordb_tpu.parallel.dist_band_pq import (
                ShardedBandIVFPQIndex)

            return ShardedBandIVFPQIndex.build(
                vectors, nlist, m=cfg.m, mesh=mesh, nbits=cfg.nbits,
                refine=cfg.refine, opq=cfg.opq, metric=cfg.metric,
                train_sample=cfg.train_sample, kmeans_iters=cfg.kmeans_iters,
                aniso_eta=cfg.aniso_eta, pq_train_iters=cfg.pq_train_iters,
                seed=cfg.seed,
            )
        raise ValueError(
            "nshards>0 supports kinds band_ivf | ivf_pq | band_ivf_pq, "
            f"got {cfg.kind!r}")
    if cfg.kind == "flat":
        return FlatIndex.build(vectors, metric=cfg.metric, dtype=cfg.dtype)
    nlist = min(cfg.nlist, max(1, vectors.shape[0] // 4))
    if cfg.kind == "band_ivf":
        dtype = cfg.dtype if cfg.dtype != "float32" else "int8"
        resid = cfg.residual and dtype == "int8"
        return BandIVFIndex.build(
            vectors, nlist, train_sample=cfg.train_sample, dtype=dtype,
            residual=resid, slack=(cfg.slack if resid else 0.0),
            kmeans_iters=cfg.kmeans_iters, seed=cfg.seed, metric=cfg.metric,
        )
    if cfg.kind == "band_ivf_pq":
        return BandIVFPQIndex.build(
            vectors, nlist, m=cfg.m, nbits=cfg.nbits, refine=cfg.refine,
            opq=cfg.opq, train_sample=cfg.train_sample,
            kmeans_iters=cfg.kmeans_iters, aniso_eta=cfg.aniso_eta,
            pq_train_iters=cfg.pq_train_iters, seed=cfg.seed,
            metric=cfg.metric,
        )
    if cfg.kind == "ivf_flat":
        return IVFFlatIndex.build(
            vectors, nlist, metric=cfg.metric, train_sample=cfg.train_sample,
            kmeans_iters=cfg.kmeans_iters, seed=cfg.seed, dtype=cfg.dtype,
        )
    if cfg.kind == "ivf_pq":
        opq_matrix = None
        if cfg.opq:
            from cloudvectordb_tpu.index.opq import train_opq

            ns = min(cfg.train_sample, vectors.shape[0], 65536)
            rs = np.random.default_rng(cfg.seed).choice(
                vectors.shape[0], ns, replace=False
            )
            opq_matrix, _ = train_opq(vectors[rs], cfg.m, cfg.nbits, seed=cfg.seed)
        return IVFPQIndex.build(
            vectors, nlist, m=cfg.m, metric=cfg.metric, nbits=cfg.nbits,
            train_sample=cfg.train_sample, kmeans_iters=cfg.kmeans_iters,
            pq_train_iters=cfg.pq_train_iters, seed=cfg.seed,
            opq_matrix=opq_matrix, refine=cfg.refine,
        )
    raise ValueError(f"unknown index kind {cfg.kind!r}")


def load_index(path: str | Path, mmap: bool = True, mesh=None) -> Index:
    """Polymorphic load: single-index artifacts dispatch on the manifest
    kind; sharded artifacts (parallel/persist.py layout) reconstruct their
    wrapper against ``mesh`` (default: a fresh 1-D 'shard' mesh sized from
    the saved shard count)."""
    from cloudvectordb_tpu.parallel.persist import (
        is_sharded_artifact, read_sharded_manifest)

    if is_sharded_artifact(path):
        from cloudvectordb_tpu.parallel.dist_band import ShardedBandIndex
        from cloudvectordb_tpu.parallel.dist_band_pq import (
            ShardedBandIVFPQIndex)
        from cloudvectordb_tpu.parallel.dist_ivf import ShardedIVFPQIndex

        kind = read_sharded_manifest(path)["kind"]
        cls = {"sharded_band_ivf": ShardedBandIndex,
               "sharded_ivf_pq": ShardedIVFPQIndex,
               "sharded_band_ivf_pq": ShardedBandIVFPQIndex}[kind]
        return cls.load(path, mesh=mesh, mmap=mmap)
    manifest = Index.read_manifest(path)
    arrays = Index.load_arrays(path, mmap=mmap)
    cls = _KINDS[manifest["kind"]]
    idx = cls._from_state(manifest, arrays)
    if manifest.get("op_point"):  # tuned serving knobs (eval/tune.py)
        idx._op_point = dict(manifest["op_point"])
    return idx
