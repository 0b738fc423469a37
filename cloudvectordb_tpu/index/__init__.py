"""L3 index engine: Flat (exact), IVF-Flat, IVF-PQ, OPQ (SURVEY.md §2.2).

All quantizer training (k-means, PQ codebooks, OPQ rotation) runs as
XLA-compiled scans on the same chips that do encoding [BASELINE.json north_star].
"""

from cloudvectordb_tpu.index.kmeans import train_kmeans  # noqa: F401
from cloudvectordb_tpu.index.flat import FlatIndex  # noqa: F401
from cloudvectordb_tpu.index.ivf_flat import IVFFlatIndex  # noqa: F401
from cloudvectordb_tpu.index.pq import train_pq, pq_encode, pq_decode  # noqa: F401
from cloudvectordb_tpu.index.ivf_pq import IVFPQIndex  # noqa: F401
from cloudvectordb_tpu.index.opq import train_opq  # noqa: F401
from cloudvectordb_tpu.index.registry import build_index, load_index  # noqa: F401
from cloudvectordb_tpu.index.filters import IdFilter, filtered_search  # noqa: F401
