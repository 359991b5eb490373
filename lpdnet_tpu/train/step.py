"""The jitted training step and descriptor-extraction function.

Reference: ``run_model`` + backward + ``optimizer.step`` in the hot loop of
``train_pointnetvlad.py`` (SURVEY C15, call stack §3.1). As in the
reference, the whole tuple batch — query, positives, negatives, other_neg —
goes through the network as ONE concatenated forward of
``(B * (1 + P + M + 1), N, C)`` submaps, then descriptors are split back;
unlike the reference, forward + loss + backward + update compile into a
single XLA program, and under a mesh the batch axis is sharded so the same
program is the data-parallel program (gradient all-reduce inserted by XLA —
SURVEY C20/C21 replacement).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lpdnet_tpu.configs import LossConfig
from lpdnet_tpu.losses import loss_from_config
from lpdnet_tpu.train.state import TrainState
from lpdnet_tpu.utils.wire import decode_points


def _tpu_compiler_options() -> Optional[Dict[str, Any]]:
    """Raise the scoped-VMEM ceiling on TPU backends: the multi-accumulator
    eq-mask scatter kernel (ops/pallas/edge_gather.py) allocates ~18 MB of
    scoped VMEM at C=64, above the 16 MB default; the option is TPU-only,
    so CPU test runs must not pass it."""
    if jax.default_backend() == "cpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": 32768}


def _flatten_tuples(batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, int, int]:
    """(B,*,N,C) tuple dict -> one (B*(1+P+M+1), N, C) stack.

    Accepts a reduced-precision wire format (float16 or int16 fixed-point
    from the sampler's ``transfer_dtype`` — halves the per-step upload);
    the decode back to f32 happens here, before any compute.
    """
    q = batch["query"][:, None]  # (B, 1, N, C)
    pos = batch["positives"]
    neg = batch["negatives"]
    other = batch["other_neg"][:, None]
    stacked = jnp.concatenate([q, pos, neg, other], axis=1)
    b, t, n, c = stacked.shape
    flat = decode_points(stacked.reshape(b * t, n, c))
    return flat, pos.shape[1], neg.shape[1]


def build_step_fn(
    model, loss_cfg: LossConfig
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, jnp.ndarray]]:
    """The un-jitted train step body (fwd + loss + bwd + optimizer update).

    Shared by the data-parallel wrapper below and the tensor-parallel one in
    ``parallel/tp.py`` — parallelism is expressed purely through shardings on
    the SAME program.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        flat, p, m = _flatten_tuples(batch)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                flat,
                train=True,
                mutable=["batch_stats"],
            )
            b = batch["query"].shape[0]
            t = 1 + p + m + 1
            desc = out.reshape(b, t, -1)
            q = desc[:, 0]
            pos = desc[:, 1 : 1 + p]
            neg = desc[:, 1 + p : 1 + p + m]
            other = desc[:, -1]
            loss = loss_from_config(loss_cfg, q, pos, neg, other)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, loss

    return step


def make_train_step(
    model,
    loss_cfg: LossConfig,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, jnp.ndarray]]:
    """Build the jitted train step.

    With ``mesh`` set, inputs are constrained batch-sharded and the state
    replicated, making the compiled program data-parallel over the mesh.
    """
    step = build_step_fn(model, loss_cfg)
    opts = _tpu_compiler_options()
    if mesh is None:
        return jax.jit(
            step, donate_argnums=(0,) if donate else (),
            compiler_options=opts,
        )

    batch_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    batch_shardings = {
        "query": batch_sh,
        "positives": batch_sh,
        "negatives": batch_sh,
        "other_neg": batch_sh,
    }
    return jax.jit(
        step,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=opts,
    )


def make_embed_fn(
    model,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
) -> Callable[[Any, jnp.ndarray], jnp.ndarray]:
    """Inference-mode descriptor extraction ``(B, N, C) -> (B, D)``.

    Used by eval descriptor sweeps and the mining cache refresh (reference
    ``get_latent_vectors`` — SURVEY C16/C18). Under a mesh the batch is
    sharded over devices (the reference's eval fan-out, minus the gather —
    jax returns a global array).
    """

    def embed(variables, points):
        # Accept a reduced-precision wire format (float16 or int16
        # fixed-point from the eval/mining sweeps — halves host->device
        # transfer): the decode back to f32 happens before any compute, so
        # only input quantization remains (measured descriptor cosine
        # 0.999998 for f16; int16 quantizes ~20x finer still).
        return model.apply(variables, decode_points(points), train=False)

    if mesh is None:
        return jax.jit(embed)
    batch_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(embed, in_shardings=(repl, batch_sh), out_shardings=repl)


def make_embed_many_fn(
    model,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
) -> Callable[[Any, jnp.ndarray], jnp.ndarray]:
    """Chunked descriptor extraction ``(K, B, N, C) -> (K, B, D)``.

    K batches are chained inside ONE compiled program (``lax.scan``), so a
    descriptor sweep pays the dispatch cost once per K batches instead of
    per batch. Opt-in via ``EvalConfig.sweep_chunk`` for hosts with fast
    DMA; on this image's ~38 MB/s tunneled chip the single big upload
    serializes against the scan and LOSES to per-batch dispatches whose
    transfers overlap compute (measured 666 vs 814+ submaps/s).
    """

    def embed_many(variables, points):
        def body(carry, pts):
            return carry, model.apply(
                variables, decode_points(pts), train=False
            )

        _, out = jax.lax.scan(body, None, points)
        return out

    if mesh is None:
        return jax.jit(embed_many)
    batch_sh = NamedSharding(mesh, P(None, data_axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        embed_many, in_shardings=(repl, batch_sh), out_shardings=repl
    )
