"""Tensor-parallel NetVLAD head over a 2-D ``(data, model)`` device mesh.

The reference has no model parallelism at all (``nn.DataParallel`` replicates
the whole module per GPU — SURVEY C20/C21). This module adds the TPU-native
counterpart for scaling the model dimension: Megatron-style sharding of the
NetVLAD head over a ``model`` mesh axis, expressed purely as GSPMD parameter
shardings on the SAME train-step program (``train/step.py``) — XLA derives
every collective (the softmax's cross-shard max/sum, the output projection's
partial-matmul all-reduce) from the sharding annotations; there is no manual
collective code to maintain.

Why the head: at flagship shape (K=64 clusters, D=1024 features) the head
holds the bulk of the parameters — ``hidden1_weights`` alone is
``K*D x output_dim = 65536 x 256`` (~16.8M params, ~67 MB fp32 with Adam's
two moment copies tripling that). Cluster-axis sharding splits it cleanly:

  * ``cluster_weights`` kernel ``(D, K)`` — column-sharded: each device
    computes assignment logits for its K/m clusters;
  * ``cluster_bn`` scale/bias/mean/var ``(K,)`` — sharded with the logits;
  * ``cluster_centers`` ``(K, D)`` — row-sharded: residual aggregation is
    per-cluster, so it stays local;
  * ``hidden1_weights`` kernel ``(K*D, output_dim)`` — row-sharded: each
    device contracts its VLAD slice, XLA all-reduces the partial products
    over the ``model`` axis.

Everything else (trunk, gating, output BN) is replicated; the batch axis
shards over ``data`` exactly as in the 1-D path.

Mesh layout for real hardware: model-axis collectives fire several times per
step on small tensors — they must ride ICI; the data-axis gradient
all-reduce is once per step and tolerates DCN. ``make_multislice_mesh``
therefore puts ``data`` across slices (DCN) and ``model`` within a slice
(ICI). On a single slice (or the virtual CPU fleet) ``make_mesh_2d`` is the
plain row-major split.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lpdnet_tpu.configs import LossConfig
from lpdnet_tpu.parallel.mesh import batch_sharding, replicate_sharding
from lpdnet_tpu.train.state import TrainState
from lpdnet_tpu.train.step import _tpu_compiler_options, build_step_fn


def make_mesh_2d(
    data: int, model: int, axes: Tuple[str, str] = ("data", "model")
) -> Mesh:
    """Row-major ``(data, model)`` mesh over the first data*model devices.

    Adjacent device ids land on the model axis — on a TPU slice (and in the
    virtual CPU fleet) those are the ICI-nearest, which is where the per-layer
    model collectives belong.
    """
    devices = jax.devices()
    need = data * model
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(grid, axes)


def make_multislice_mesh(
    num_slices: int,
    chips_per_slice: Optional[int] = None,
    axes: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """DCN-aware 2-D mesh: ``data`` across slices, ``model`` within a slice.

    On multislice hardware, devices carry a ``slice_index``; rows of the mesh
    group by it so the model axis never crosses DCN. Environments without
    slice indices (single slice, CPU fleet) fall back to contiguous blocks as
    pseudo-slices — same program, ICI-only.
    """
    devs = jax.devices()
    slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devs})
    if len(slice_ids) > 1:
        # Real multislice hardware: rows MUST group by slice — a contiguous
        # fallback would put model-axis collectives on DCN, the exact
        # failure this helper exists to prevent.
        if len(slice_ids) < num_slices:
            raise ValueError(
                f"requested {num_slices} slices, hardware has "
                f"{len(slice_ids)}"
            )
        rows = []
        for s in slice_ids[:num_slices]:
            grp = sorted(
                (d for d in devs if (getattr(d, "slice_index", 0) or 0) == s),
                key=lambda d: d.id,
            )
            rows.append(grp)
        per = chips_per_slice or min(len(r) for r in rows)
        short = [i for i, r in enumerate(rows) if len(r) < per]
        if short:
            raise ValueError(
                f"chips_per_slice={per} exceeds the device count of "
                f"slice(s) {short} "
                f"(sizes {[len(rows[i]) for i in short]})"
            )
        grid = np.asarray([r[:per] for r in rows])
    else:
        # Single slice / virtual CPU fleet: contiguous pseudo-slices.
        per = chips_per_slice or len(devs) // num_slices
        if num_slices * per > len(devs):
            raise ValueError(
                f"need {num_slices * per} devices, have {len(devs)}"
            )
        grid = np.asarray(devs[: num_slices * per]).reshape(num_slices, per)
    return Mesh(grid, axes)


# ---------------------------------------------------------------------------
# Parameter partition rules (name-matched over pytree key paths, so the same
# rules cover params, batch_stats, and Adam's mu/nu which mirror the tree).
# ---------------------------------------------------------------------------


def _head_spec(path: str, leaf: Any, model_axis: str) -> P:
    ndim = getattr(leaf, "ndim", None)
    if ndim in (None, 0):
        return P()
    if "cluster_weights" in path and "kernel" in path and ndim == 2:
        return P(None, model_axis)  # (D, K): shard assignment columns
    if "cluster_weights" in path and "bias" in path and ndim == 1:
        return P(model_axis)
    if "cluster_bn" in path and ndim == 1:
        return P(model_axis)  # scale/bias + running mean/var over K
    if "cluster_centers" in path and ndim == 2:
        return P(model_axis, None)  # (K, D): per-cluster rows
    if "hidden1_weights" in path and "kernel" in path and ndim == 2:
        return P(model_axis, None)  # (K*D, out): row-shard the contraction
    return P()


def partition_specs(tree: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for any tree shaped like (or containing) the
    model variables — TrainState, params, batch_stats, optimizer moments."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: _head_spec(jax.tree_util.keystr(p), leaf, model_axis),
        tree,
    )


def state_shardings(tree: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        partition_specs(tree, model_axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_state(state: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Place a TrainState (or variables dict) with the head sharded over
    ``model_axis`` and everything else replicated over the whole mesh.

    Works over multi-process meshes too: every process holds the same host
    value (same init seed / same restored checkpoint), and each assembles
    the global array from its addressable shards — ``jax.device_put`` to a
    sharding containing other processes' devices is not allowed."""
    sh = state_shardings(state, mesh, model_axis)
    if jax.process_count() > 1:
        def put(x, s):
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, s, lambda idx: host[idx]
            )

        return jax.tree_util.tree_map(put, state, sh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def gather_tree(tree: Any, mesh: Mesh) -> Any:
    """All-gather every leaf to fully-replicated and fetch to host numpy.

    Used at the end of multi-process tensor-parallel runs: model-sharded
    leaves are not fully addressable, so ``jax.device_get`` alone fails;
    a jitted identity with replicated out-shardings makes XLA emit the
    all-gathers, after which fully-replicated arrays convert on any
    process."""
    repl = NamedSharding(mesh, P())
    shs = jax.tree_util.tree_map(lambda _: repl, tree)
    gathered = jax.jit(lambda t: t, out_shardings=shs)(tree)
    return jax.device_get(gathered)


def check_divisibility(num_clusters: int, mesh: Mesh, model_axis: str) -> None:
    m = mesh.shape[model_axis]
    if num_clusters % m:
        raise ValueError(
            f"num_clusters={num_clusters} not divisible by the "
            f"{model_axis!r} mesh axis ({m})"
        )


# ---------------------------------------------------------------------------
# Jitted entry points: identical step/embed bodies, 2-D shardings.
# ---------------------------------------------------------------------------


def make_tp_train_step(
    model,
    loss_cfg: LossConfig,
    mesh: Mesh,
    state: TrainState,
    data_axis: str = "data",
    model_axis: str = "model",
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, jnp.ndarray]]:
    """Train step over a 2-D mesh: batch sharded over ``data_axis``, the
    NetVLAD head sharded over ``model_axis`` (state template fixes the
    sharding pytree — pass the unsharded state or one from shard_state)."""
    step = build_step_fn(model, loss_cfg)
    st_sh = state_shardings(state, mesh, model_axis)
    batch_sh = batch_sharding(mesh, data_axis)
    batch_shardings = {
        "query": batch_sh,
        "positives": batch_sh,
        "negatives": batch_sh,
        "other_neg": batch_sh,
    }
    repl = replicate_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(st_sh, batch_shardings),
        out_shardings=(st_sh, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=_tpu_compiler_options(),
    )


def make_tp_embed_fn(
    model,
    mesh: Mesh,
    variables: Dict[str, Any],
    data_axis: str = "data",
    model_axis: str = "model",
) -> Callable[[Dict[str, Any], jnp.ndarray], jnp.ndarray]:
    """Inference embed ``(B, N, C) -> (B, D)`` with the head model-sharded
    and the batch data-sharded; descriptors come back replicated."""

    def embed(variables, points):
        from lpdnet_tpu.utils.wire import decode_points

        return model.apply(variables, decode_points(points), train=False)

    var_sh = state_shardings(variables, mesh, model_axis)
    return jax.jit(
        embed,
        in_shardings=(var_sh, batch_sharding(mesh, data_axis)),
        out_shardings=replicate_sharding(mesh),
    )
