"""Train state: params + optimizer + BatchNorm statistics.

Reference: the driver's Adam-with-decayed-LR setup and
``{'epoch','state_dict','optimizer'}`` checkpoints (SURVEY C15/C17). Here
the whole state is one pytree (params, opt state, batch stats, step), which
Orbax checkpoints atomically and jit treats as a single donated carry.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import optax
from flax import core, struct

from lpdnet_tpu.configs import ModelConfig, TrainConfig
from lpdnet_tpu.models.model import init_model


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, *, grads, batch_stats) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=batch_stats,
            opt_state=new_opt_state,
        )


def make_lr_schedule(
    cfg: TrainConfig, examples_per_step: int | None = None
) -> optax.Schedule:
    """Exponential stair decay in *examples*, matching the reference's
    ``BASE * DECAY_RATE ^ (examples / DECAY_STEP)`` (SURVEY C1). Each step
    consumes ``examples_per_step`` examples — ``batch_num_queries`` on one
    device, ``batch_num_queries * mesh_size`` under per-device batch
    scaling."""
    per_step = examples_per_step or cfg.batch_num_queries
    transition_steps = max(cfg.decay_step // per_step, 1)
    sched = optax.exponential_decay(
        init_value=cfg.base_learning_rate,
        transition_steps=transition_steps,
        decay_rate=cfg.decay_rate,
        staircase=True,
    )

    def clipped(step):
        return jax.numpy.maximum(sched(step), cfg.min_learning_rate)

    return clipped


def make_optimizer(
    cfg: TrainConfig, examples_per_step: int | None = None
) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg, examples_per_step)
    if cfg.optimizer == "adam":
        return optax.adam(sched)
    if cfg.optimizer == "momentum":
        return optax.sgd(sched, momentum=cfg.momentum)
    raise ValueError(f"unknown optimizer: {cfg.optimizer!r}")


def create_train_state(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    rng: jax.Array,
    examples_per_step: int | None = None,
) -> tuple[nn.Module, TrainState]:
    model, variables = init_model(model_cfg, rng, batch_size=1)
    tx = make_optimizer(train_cfg, examples_per_step)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
    return model, state
