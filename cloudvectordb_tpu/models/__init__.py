"""L5 encoder layer: flax transformer sentence encoder + large-batch encode."""

from cloudvectordb_tpu.models.encoder import Encoder, init_encoder  # noqa: F401
