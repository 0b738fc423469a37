"""L0 kernels: fused distance+top-k, PQ decode/ADC, k-means assignment.

Two implementations per hot op:
  - an XLA path (``lax.scan`` over tiles) — correctness backbone, runs on any
    backend, surprisingly close to speed-of-light because the MXU matmul
    dominates;
  - a Pallas path (fused tile matmul + bucketed top-k merge in VMEM) — avoids
    materializing per-tile score matrices in HBM on the biggest scans.

Design note (TPU-first, SURVEY.md §7.3): TPUs have no fast random gather, so
PQ scoring is NOT a LUT-gather ADC like CPU/GPU implementations. Instead PQ is
treated as a *memory format*: code tiles are decoded on-the-fly with one-hot
matmuls (MXU) into VMEM-resident bf16 tiles and scored with a plain matmul
against the query block, amortizing decode cost over the query batch.
"""

import functools

from cloudvectordb_tpu.ops.topk import tiled_topk, merge_topk  # noqa: F401
from cloudvectordb_tpu.ops.assign import assign_clusters  # noqa: F401
from cloudvectordb_tpu.ops.adc import adc_scan  # noqa: F401

# SURVEY.md §1.2 L0 public interface names
topk_ip = functools.partial(tiled_topk, metric="ip")
topk_l2 = functools.partial(tiled_topk, metric="l2")
assign_centroids = assign_clusters
