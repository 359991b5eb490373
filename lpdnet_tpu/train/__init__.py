"""Training: state, jitted step, hard-negative mining, epoch driver
(reference: ``train_pointnetvlad.py`` — SURVEY C15-C17)."""

from lpdnet_tpu.train.state import TrainState, create_train_state, make_lr_schedule
from lpdnet_tpu.train.step import make_train_step, make_embed_fn
from lpdnet_tpu.train.mining import DescriptorCache

__all__ = [
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "make_train_step",
    "make_embed_fn",
    "DescriptorCache",
]
