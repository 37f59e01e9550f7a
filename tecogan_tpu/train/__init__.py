"""Training: losses, optimizers, adaptive-D gating, checkpointing."""

from tecogan_tpu.train.losses import (
    content_loss,
    warp_loss,
    pingpong_loss,
    vgg_cosine_loss,
    assemble_dst_inputs,
    d_layer_losses,
)
from tecogan_tpu.train.trainer import TrainState, Trainer, prepare_batch

__all__ = [
    "content_loss",
    "warp_loss",
    "pingpong_loss",
    "vgg_cosine_loss",
    "assemble_dst_inputs",
    "d_layer_losses",
    "TrainState",
    "Trainer",
    "prepare_batch",
]
