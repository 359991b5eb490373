"""Device-mesh parallelism (replaces the reference's ``nn.DataParallel``
scatter/gather — SURVEY C20/C21 — with XLA collectives over ICI)."""

from lpdnet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from lpdnet_tpu.parallel.ddp import make_ddp_train_step

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "make_ddp_train_step",
]
