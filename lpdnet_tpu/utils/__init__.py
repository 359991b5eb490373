"""Utilities: structured metrics logging + Orbax checkpointing (the
reference's print/tensorboardX + torch.save — SURVEY C17/C19 — rebuilt as
JSONL + Orbax, per SURVEY §5)."""

from lpdnet_tpu.utils.logging import MetricsLogger
from lpdnet_tpu.utils.checkpoint import CheckpointManager

__all__ = ["MetricsLogger", "CheckpointManager"]
