"""Metric-learning losses (reference: ``loss/pointnetvlad_loss.py`` — SURVEY
C14)."""

from lpdnet_tpu.losses.quadruplet import (
    best_pos_distance,
    triplet_loss,
    triplet_loss_wrapper,
    quadruplet_loss,
    loss_from_config,
)

__all__ = [
    "best_pos_distance",
    "triplet_loss",
    "triplet_loss_wrapper",
    "quadruplet_loss",
    "loss_from_config",
]
