"""L2 trainer core: contrastive losses, DP train step, checkpointing."""

from cloudvectordb_tpu.train.losses import infonce_loss, triplet_margin_loss  # noqa: F401
from cloudvectordb_tpu.train.trainer import Trainer, TrainState  # noqa: F401
