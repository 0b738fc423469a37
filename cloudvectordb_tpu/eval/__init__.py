"""Evaluation layer: brute-force ground truth, recall@k, QPS measurement."""

from cloudvectordb_tpu.eval.recall import brute_force_topk, recall_at_k  # noqa: F401
from cloudvectordb_tpu.eval.qps import qps_bench  # noqa: F401
