"""Device-mesh parallelism (replaces the reference's ``nn.DataParallel``
scatter/gather — SURVEY C20/C21 — with XLA collectives over ICI/DCN).

Five paths (the first three share one step program):
  * GSPMD data parallel (``train/step.py``) — 1-D mesh, batch-sharded;
  * explicit-collective DDP (``ddp.py``) — shard_map + pmean, per-replica BN;
  * tensor-parallel head (``tp.py``) — 2-D (data, model) mesh, Megatron-style
    NetVLAD sharding via parameter shardings only;
  * point-axis sequence parallelism (``sp.py``) — one submap sharded over
    the mesh via Morton windows + halo, NetVLAD partials psum'd (serving
    latency path);
  * GPipe-style pipeline parallelism (``pp.py``) — the forward staged over
    a ``('stage',)`` mesh, microbatches streaming via ppermute, train step
    differentiable through the whole schedule. At flagship scale a whole
    replica fits one chip comfortably, so PP is a capability/latency-memory
    trade here, not a throughput win — benchmark DP/TP first.

Deliberately absent: expert parallelism (no MoE anywhere in the family).

Multi-process (multi-host pods): ``multiprocess.py`` — jax.distributed
bootstrap, process-local batch feeding, primary-process side-effect
guards, and sharded checkpointing for cross-process TP. The mesh/step
code above is process-count-agnostic.
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
from lpdnet_tpu.parallel.sp import make_sp_embed_fn, make_sp_mesh
from lpdnet_tpu.parallel.pp import (
    build_plan,
    create_pp_train_state,
    make_pp_embed_fn,
    make_pp_mesh,
    make_pp_train_step,
    stacks_to_variables,
    variables_to_stacks,
)
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
    "make_sp_mesh",
    "build_plan",
    "create_pp_train_state",
    "make_pp_embed_fn",
    "make_pp_mesh",
    "make_pp_train_step",
    "stacks_to_variables",
    "variables_to_stacks",
]
