"""Explicit-collective data-parallel training step (shard_map + pmean).

Two parallel paths exist in this framework:

  * ``train/step.py`` — GSPMD: ``jit`` with ``in_shardings``; XLA decides
    where collectives go. BatchNorm statistics are computed over the
    GLOBAL batch (the mean reduction spans the sharded axis).
  * this module — ``jax.shard_map`` with explicit ``lax.pmean``: each
    device runs the whole step on its local shard, BatchNorm statistics
    are PER-REPLICA (the reference's ``nn.DataParallel`` normalization
    semantics, SURVEY C20 — each GPU normalizes with its own batch
    slice), and gradients/batch-stats average across the mesh explicitly.

The GSPMD path is the default (global BN is usually the better
normalization); this path exists for reference-faithful DDP semantics and
as the explicit-collective blueprint (psum/pmean ride ICI on real meshes).

Limitation: ``ignore_zero_loss=True`` averages over *active* tuples, which
is non-linear across shards — a pmean of per-shard means diverges from the
global-batch value whenever activity is unevenly distributed. This path
rejects that flag; use the GSPMD step for it.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lpdnet_tpu.configs import LossConfig
from lpdnet_tpu.losses import loss_from_config
from lpdnet_tpu.parallel.mesh import shard_batch
from lpdnet_tpu.train.state import TrainState
from lpdnet_tpu.train.step import _flatten_tuples, _tpu_compiler_options


def make_ddp_train_step(
    model,
    loss_cfg: LossConfig,
    mesh: Mesh,
    data_axis: str = "data",
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, jnp.ndarray]]:
    """Build the shard_map train step. The batch's leading axis must be
    divisible by the mesh size; state is replicated in and out."""
    if loss_cfg.ignore_zero_loss:
        raise ValueError(
            "ignore_zero_loss averages over active tuples, which does not "
            "decompose across shards; use the GSPMD train step "
            "(train.step.make_train_step) for that flag"
        )

    def per_device_grads(params, batch_stats, batch):
        # Everything in here sees the LOCAL batch shard.
        flat, p, m = _flatten_tuples(batch)
        b = batch["query"].shape[0]
        t = 1 + p + m + 1

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                flat,
                train=True,
                mutable=["batch_stats"],
            )
            desc = out.reshape(b, t, -1)
            loss = loss_from_config(
                loss_cfg, desc[:, 0], desc[:, 1 : 1 + p],
                desc[:, 1 + p : 1 + p + m], desc[:, -1],
            )
            return loss, mutated["batch_stats"]

        (loss, local_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # Explicit collectives over the mesh axis (ICI on hardware):
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        # DataParallel keeps replica-0 statistics; averaging replicas is
        # the strictly-better variant of the same per-replica semantics.
        stats = jax.lax.pmean(local_stats, data_axis)
        return grads, stats, loss

    repl = P()  # replicated
    batch_spec = {
        "query": P(data_axis),
        "positives": P(data_axis),
        "negatives": P(data_axis),
        "other_neg": P(data_axis),
    }

    sharded = jax.shard_map(
        per_device_grads,
        mesh=mesh,
        in_specs=(repl, repl, batch_spec),
        out_specs=(repl, repl, repl),
        check_vma=False,
    )

    # Same raised scoped-VMEM ceiling as the other train steps: the
    # multi-accumulator eq-mask scatter backward (Pallas gather VJP) needs
    # ~18 MB of scoped VMEM on TPU backends.
    @partial(
        jax.jit, donate_argnums=(0,), compiler_options=_tpu_compiler_options()
    )
    def step(state: TrainState, batch):
        grads, stats, loss = sharded(state.params, state.batch_stats, batch)
        new_state = state.apply_gradients(grads=grads, batch_stats=stats)
        return new_state, loss

    def run(state, batch):
        return step(state, shard_batch(batch, mesh, data_axis))

    return run
