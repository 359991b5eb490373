"""Device-mesh parallelism (replaces the reference's ``nn.DataParallel``
scatter/gather — SURVEY C20/C21 — with XLA collectives over ICI/DCN).

Four paths (the first three share one step program; SP is inference-only):
  * GSPMD data parallel (``train/step.py``) — 1-D mesh, batch-sharded;
  * explicit-collective DDP (``ddp.py``) — shard_map + pmean, per-replica BN;
  * tensor-parallel head (``tp.py``) — 2-D (data, model) mesh, Megatron-style
    NetVLAD sharding via parameter shardings only;
  * point-axis sequence parallelism (``sp.py``) — one submap sharded over
    the mesh via Morton windows + halo, NetVLAD partials psum'd (serving
    latency path).

Deliberately absent: pipeline parallelism (the model is two EdgeConvs and
a head — there is no layer stack deep enough to fill a pipeline, and a
whole model replica fits in one chip's HBM thousands of times over) and
expert parallelism (no MoE anywhere in the family). Scale here means
batch, the model axis of the head, and the point axis — all three are
implemented.

Multi-process (multi-host pods): ``multiprocess.py`` — jax.distributed
bootstrap, process-local batch feeding, primary-process side-effect
guards. The mesh/step code above is process-count-agnostic.
"""

from lpdnet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from lpdnet_tpu.parallel.ddp import make_ddp_train_step
from lpdnet_tpu.parallel.tp import (
    make_mesh_2d,
    make_multislice_mesh,
    make_tp_train_step,
    make_tp_embed_fn,
    shard_state,
    partition_specs,
)
from lpdnet_tpu.parallel.sp import make_sp_embed_fn
from lpdnet_tpu.parallel.multiprocess import (
    initialize as initialize_distributed,
    is_primary,
    shard_batch_mp,
    make_mp_sweep_embed_fn,
)

__all__ = [
    "initialize_distributed",
    "is_primary",
    "shard_batch_mp",
    "make_mp_sweep_embed_fn",
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "make_ddp_train_step",
    "make_mesh_2d",
    "make_multislice_mesh",
    "make_tp_train_step",
    "make_tp_embed_fn",
    "shard_state",
    "partition_specs",
    "make_sp_embed_fn",
]
