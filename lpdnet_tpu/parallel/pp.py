"""Pipeline parallelism: the LPD-Net forward staged over a ``('stage',)`` mesh.

The reference has no model parallelism at all (``nn.DataParallel`` replicates
the whole module — SURVEY C20/C21). This module completes the framework's
parallelism matrix (DP / DDP / TP / SP / **PP**) with a GPipe-style pipeline:
the flagship forward is partitioned into contiguous STAGES, one per device
along a 1-D ``('stage',)`` mesh; microbatches stream through the stages, and
activations hop stage -> stage+1 over ICI via ``lax.ppermute`` on the classic
``M + S - 1``-tick schedule (``S - 1`` bubble ticks).

Heterogeneous stages under SPMD
  Every device runs the same program, so the per-stage computation is a
  ``lax.switch`` over stage bodies, and per-stage parameters ride a *padded,
  stacked* buffer: each stage's param pytree is flattened to one f32 vector,
  zero-padded to the longest stage, and the ``(S, P_max)`` stack is sharded
  ``P('stage')`` — each device materializes exactly one row. The padding
  overhead per device is bounded by the largest stage (for the flagship,
  the NetVLAD head's ``K*D x output_dim`` projection). BatchNorm state rides
  an identically-shaped stats stack. Activations cross stages in a
  fixed-width buffer padded to the widest cut boundary.

Training
  The whole schedule is ONE differentiable program: ``jax.grad`` through the
  scan + ppermute yields the reverse pipeline automatically (ppermute
  transposes to the opposite permutation), so forward + loss + backward +
  Adam update compile into a single XLA program like every other train step
  here. BatchNorm statistics update per microbatch, sequentially within each
  stage — the per-replica-BN analogue of the DDP path (``parallel/ddp.py``);
  bubble ticks are masked out of the statistics. Stage bodies are
  rematerialized (``jax.checkpoint``) so the backward re-runs each stage
  instead of saving every tick's internals.

Checkpoint compatibility
  ``variables_to_stacks`` / ``stacks_to_variables`` convert losslessly
  between the full model's variables and the stage stacks, so PP runs
  save/restore through the same payload structure as every other path, and
  any existing checkpoint can be re-partitioned onto a pipeline at load.

Scope: both model families. For the LPD trunk (the flagship) the pipeline
cut points are the trunk's natural unit boundaries (SURVEY C11/C12):
[feature stage + pre-MLP + spatial EdgeConv] -> [feature-graph EdgeConv]
-> [post-MLP] -> [NetVLAD head]; ``num_stages`` in 1..4 groups contiguous
units evenly. For the PointNetVLAD baseline trunk (SURVEY C10) the units
are [STN + mlp1] -> [feature transform + mlp2] -> [NetVLAD head]
(``num_stages`` in 1..3). At flagship
scale PP is a latency/memory trade (the model fits one chip comfortably) —
this is the framework capability, validated on the virtual fleet.

DPxPP composition
  ``make_pp_mesh(stages, data=D)`` builds a 2-D ``(data, stage)`` mesh of D
  data-parallel pipeline replicas. Microbatch rows shard over ``data``
  (specs only — same schedule program), the stage stacks stay replicated
  across replicas (shard_map's transpose psums their cotangents: the
  gradient all-reduce), the loss is computed globally outside the
  shard_map, and BatchNorm statistics are per-replica with one cross-
  replica average per step (the parallel/ddp.py convention). Reachable
  from the CLI via ``--pp_stages S --pp_data D``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lpdnet_tpu.configs import LossConfig, ModelConfig, TrainConfig
from lpdnet_tpu.losses import loss_from_config
from lpdnet_tpu.models.lpdnet import (
    EdgeConv, LPDNetFeat, knn_dist_dtype, lse_fused_enabled, lse_reuse_kth,
    make_lse_agg,
)
from lpdnet_tpu.models.model import knn_window_policy, use_pallas_gather
from lpdnet_tpu.models.netvlad import NetVLADLoupe
from lpdnet_tpu.models.pointnet import PointMLP, STN3d
from lpdnet_tpu.ops.features import eigen_features_and_knn
from lpdnet_tpu.ops.knn import knn_indices
from lpdnet_tpu.ops.morton import morton_sort
from lpdnet_tpu.train.state import make_optimizer
from lpdnet_tpu.train.step import _flatten_tuples, _tpu_compiler_options

# Forward-policy helpers are SHARED with the monolithic model so the
# pipelined stages can never drift from DescriptorNet's behavior.
_window = knn_window_policy
_use_pallas = use_pallas_gather


def _dist_dtype(cfg: ModelConfig) -> str:
    return knn_dist_dtype(cfg.compute_dtype)


def _lse_agg(cfg: ModelConfig, space, kth=None):
    """The gather-free LSE aggregator for one EdgeConv, parameterized
    exactly as DescriptorNet parameterizes LPDNetFeat (models/model.py) —
    stages must aggregate identically to the monolithic trunk
    (tests/test_pp.py pins staged == monolithic under 'lse')."""
    return make_lse_agg(
        space, k=cfg.graph_k, t0=cfg.lse_t0, levels=cfg.lse_levels,
        block=cfg.features.knn_block, window=_window(cfg),
        recall_target=cfg.features.recall_target, exact=cfg.exact_knn,
        dist_dtype=_dist_dtype(cfg), kth=kth,
        tie_correction=cfg.lse_tie_correction,
        # Same gate call as DescriptorNet: with lse_fused='on' the stages
        # must use the exact-selection kernel too, or staged descriptors
        # silently drift from the monolithic model wherever approx_min_k
        # misses a neighbour (round-5 review finding).
        fused=lse_fused_enabled(cfg, _window(cfg)),
    )


# ---------------------------------------------------------------------------
# Pipeline units: flax modules whose submodule NAMES match the full model's
# param tree, so stage variables are exact subtrees of DescriptorNet's
# (parity enforced by tests/test_pp.py against the monolithic forward).
# ---------------------------------------------------------------------------


class _SpatialUnit(nn.Module):
    """xyz -> Morton sort -> 10-D feature stage -> pre-MLP -> spatial
    EdgeConv. Mirrors models/model.py + LPDNetFeat stages 1-2."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        window = _window(cfg)
        if window is not None:
            x = morton_sort(x)
        idx_xyz = None
        kth_xyz = None
        if cfg.compute_features_on_device and x.shape[-1] == 3:
            reuse_kth = lse_reuse_kth(cfg)
            out = eigen_features_and_knn(
                x,
                cfg.features.k,
                eps=cfg.features.eps,
                block=cfg.features.knn_block,
                recall_target=cfg.features.recall_target,
                fused_stats=cfg.features.fused_stats,
                exact=cfg.exact_knn,
                window=window,
                return_kth=reuse_kth,
            )
            feats, idx = out[0], out[1]
            if reuse_kth:
                kth_xyz = out[2]
            x = jnp.concatenate([x.astype(jnp.float32), feats], axis=-1)
            if cfg.features.k == cfg.graph_k:
                idx_xyz = idx
        xyz = x[..., :3]
        h = PointMLP(
            list(LPDNetFeat.pre_widths), relu_last=True, dtype=dtype,
            name="pre",
        )(x, train=train)
        if cfg.resolved_aggregation == "lse":
            return EdgeConv(
                LPDNetFeat.spatial_width, dtype=dtype,
                bn_placement=cfg.edge_bn_placement, name="edge_spatial",
            )(h, None, train=train, agg_fn=_lse_agg(cfg, xyz, kth=kth_xyz))
        if idx_xyz is None:
            idx_xyz = knn_indices(
                xyz, cfg.graph_k, block=cfg.features.knn_block,
                dist_dtype=_dist_dtype(cfg),
                recall_target=cfg.features.recall_target,
                exact=cfg.exact_knn, window=window,
            )
        return EdgeConv(
            LPDNetFeat.spatial_width, dtype=dtype,
            bn_placement=cfg.edge_bn_placement,
            pallas_gather=_use_pallas(cfg), name="edge_spatial",
        )(h, idx_xyz, train=train)


class _FeatureUnit(nn.Module):
    """Feature-space kNN graph + feature EdgeConv (LPDNetFeat stage 3)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.resolved_aggregation == "lse":
            return EdgeConv(
                LPDNetFeat.feature_width, dtype=jnp.dtype(cfg.compute_dtype),
                bn_placement=cfg.edge_bn_placement, name="edge_feature",
            )(h, None, train=train, agg_fn=_lse_agg(cfg, h))
        idx_feat = knn_indices(
            h, cfg.graph_k, block=cfg.features.knn_block,
            dist_dtype=_dist_dtype(cfg),
            recall_target=cfg.features.recall_target,
            exact=cfg.exact_knn, window=_window(cfg),
        )
        return EdgeConv(
            LPDNetFeat.feature_width, dtype=jnp.dtype(cfg.compute_dtype),
            bn_placement=cfg.edge_bn_placement,
            pallas_gather=_use_pallas(cfg), name="edge_feature",
        )(h, idx_feat, train=train)


class _PostUnit(nn.Module):
    """Post-MLP to the trunk's per-point width (LPDNetFeat stage 4)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        return PointMLP(
            list(LPDNetFeat.post_widths) + [cfg.feature_dim],
            relu_last=False, dtype=jnp.dtype(cfg.compute_dtype), name="post",
        )(h, train=train)


class _PNFrontUnit(nn.Module):
    """PointNetVLAD baseline trunk, front half: STN3d input alignment +
    mlp1 (models/pointnet.py PointNetFeat, SURVEY C10)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.use_input_transform:
            trans = STN3d(k=3, dtype=dtype, name="stn")(x, train=train)
            x = jnp.einsum(
                "bnc,bcd->bnd", x, trans, preferred_element_type=jnp.float32
            )
        return PointMLP(
            [64, 64], relu_last=True, dtype=dtype, name="mlp1"
        )(x, train=train)


class _PNBackUnit(nn.Module):
    """PointNetVLAD baseline trunk, back half: optional 64x64 feature
    alignment + mlp2 to ``feature_dim`` per-point features."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.use_feature_transform:
            ftrans = STN3d(k=64, dtype=dtype, name="fstn")(h, train=train)
            h = jnp.einsum(
                "bnc,bcd->bnd", h, ftrans,
                preferred_element_type=jnp.float32,
            )
        return PointMLP(
            [64, 128, cfg.feature_dim], relu_last=False, dtype=dtype,
            name="mlp2",
        )(h, train=train)


class _HeadUnit(nn.Module):
    """NetVLAD head + output normalization (models/model.py tail)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        desc = NetVLADLoupe(
            feature_size=cfg.feature_dim,
            cluster_size=cfg.num_clusters,
            output_dim=cfg.output_dim,
            add_batch_norm=cfg.add_batch_norm,
            gating=cfg.gating,
            post_projection_bn=cfg.post_projection_bn,
            dtype=jnp.dtype(cfg.compute_dtype),
            name="netvlad",
        )(h, train=train)
        if cfg.normalize_output:
            desc = desc / jnp.sqrt(
                jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12
            )
        return desc


@dataclasses.dataclass(frozen=True)
class _Unit:
    name: str
    module: nn.Module
    # full-model param path of each of the module's top-level submodules
    paths: Dict[str, Tuple[str, ...]]
    out_width: int  # per-point channels out ((B, D) for the head)


def _make_units(cfg: ModelConfig) -> List[_Unit]:
    if cfg.trunk == "pointnetvlad":
        front_paths = {"mlp1": ("trunk", "mlp1")}
        if cfg.use_input_transform:
            front_paths["stn"] = ("trunk", "stn")
        back_paths = {"mlp2": ("trunk", "mlp2")}
        if cfg.use_feature_transform:
            back_paths["fstn"] = ("trunk", "fstn")
        return [
            _Unit("pn_front", _PNFrontUnit(cfg), front_paths, 64),
            _Unit("pn_back", _PNBackUnit(cfg), back_paths,
                  cfg.feature_dim),
            _Unit("head", _HeadUnit(cfg), {"netvlad": ("netvlad",)},
                  cfg.output_dim),
        ]
    if cfg.trunk != "lpdnet":
        raise NotImplementedError(
            f"pipeline parallelism supports the 'lpdnet' and "
            f"'pointnetvlad' trunks (got {cfg.trunk!r})"
        )
    return [
        _Unit(
            "spatial", _SpatialUnit(cfg),
            {"pre": ("trunk", "pre"),
             "edge_spatial": ("trunk", "edge_spatial")},
            LPDNetFeat.spatial_width,
        ),
        _Unit(
            "feature", _FeatureUnit(cfg),
            {"edge_feature": ("trunk", "edge_feature")},
            LPDNetFeat.feature_width,
        ),
        _Unit("post", _PostUnit(cfg), {"post": ("trunk", "post")},
              cfg.feature_dim),
        _Unit("head", _HeadUnit(cfg), {"netvlad": ("netvlad",)},
              cfg.output_dim),
    ]


# ---------------------------------------------------------------------------
# Flatten / pad plumbing for the stage stacks.
# ---------------------------------------------------------------------------


def _get_path(tree: Any, path: Tuple[str, ...]) -> Any:
    for k in path:
        tree = tree[k]
    return tree


def _unit_tree(collection: Any, unit: _Unit) -> Dict[str, Any]:
    return {sub: _get_path(collection, path)
            for sub, path in unit.paths.items()}


def _stage_tree(collection: Any, units: Sequence[_Unit]) -> Dict[str, Any]:
    return {u.name: _unit_tree(collection, u) for u in units}


def _flatten_spec(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        if jnp.asarray(leaf).dtype != jnp.float32:
            raise ValueError(
                f"stage stacking expects float32 leaves, got {leaf.dtype}"
            )
    shapes = [np.asarray(leaf).shape for leaf in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    return treedef, shapes, sizes


def _to_vec(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(
        [jnp.ravel(leaf).astype(jnp.float32) for leaf in leaves]
    )


def _from_vec(vec: jnp.ndarray, treedef, shapes, sizes) -> Any:
    parts, off = [], 0
    for sh, sz in zip(shapes, sizes):
        parts.append(vec[off:off + sz].reshape(sh))
        off += sz
    return jax.tree_util.tree_unflatten(treedef, parts)


@dataclasses.dataclass(frozen=True)
class PipelinePlan:
    """Static description of one pipeline partition of the model."""

    cfg: ModelConfig
    num_stages: int
    stage_units: Tuple[Tuple[_Unit, ...], ...]
    param_specs: Tuple[Any, ...]  # (treedef, shapes, sizes) per stage
    stats_specs: Tuple[Any, ...]
    in_widths: Tuple[int, ...]  # activation channels entering each stage
    p_max: int
    q_max: int
    buf_width: int  # inter-stage activation buffer channels

    @property
    def param_sizes(self) -> List[int]:
        return [sum(spec[2]) for spec in self.param_specs]

    @property
    def stats_sizes(self) -> List[int]:
        return [sum(spec[2]) for spec in self.stats_specs]


def build_plan(
    cfg: ModelConfig, num_stages: int, variables: Dict[str, Any],
    input_width: Optional[int] = None,
) -> PipelinePlan:
    """Partition the model into ``num_stages`` contiguous stage groups and
    record the static flatten/pad layout from a template ``variables``.

    ``input_width``: channels of the batches this pipeline will be fed
    (defaults to raw xyz when the feature stage runs on device, else
    ``cfg.input_dim``). Pass 13 to feed precomputed-feature submaps —
    the monolithic model dispatches on ``x.shape[-1]`` at runtime, but the
    pipeline's activation buffer layout is static, so the width is part of
    the plan; the embed/train fns reject batches of any other width."""
    units = _make_units(cfg)
    if not 1 <= num_stages <= len(units):
        raise ValueError(
            f"num_stages must be in 1..{len(units)}, got {num_stages}"
        )
    groups = [list(g) for g in np.array_split(units, num_stages)]
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    param_specs, stats_specs, in_widths = [], [], []
    if input_width is not None:
        in_w = input_width
    else:
        in_w = (
            3 if (cfg.compute_features_on_device and cfg.trunk == "lpdnet")
            else cfg.input_dim
        )
    for g in groups:
        param_specs.append(_flatten_spec(_stage_tree(params, g)))
        stats_specs.append(_flatten_spec(_stage_tree(stats, g)))
        in_widths.append(in_w)
        in_w = g[-1].out_width
    # Buffer must carry the widest activation actually crossing a stage cut
    # (plus the raw input fed to stage 0).
    buf_width = max(in_widths)
    return PipelinePlan(
        cfg=cfg,
        num_stages=num_stages,
        stage_units=tuple(tuple(g) for g in groups),
        param_specs=tuple(param_specs),
        stats_specs=tuple(stats_specs),
        in_widths=tuple(in_widths),
        p_max=max(sum(s[2]) for s in param_specs),
        q_max=max((sum(s[2]) for s in stats_specs), default=0),
        buf_width=buf_width,
    )


def variables_to_stacks(
    plan: PipelinePlan, variables: Dict[str, Any]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full model variables -> padded (S, P_max) / (S, Q_max) stage stacks."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    prows, srows = [], []
    for g in plan.stage_units:
        pv = _to_vec(_stage_tree(params, g))
        sv = _to_vec(_stage_tree(stats, g))
        prows.append(jnp.pad(pv, (0, plan.p_max - pv.shape[0])))
        srows.append(jnp.pad(sv, (0, plan.q_max - sv.shape[0])))
    return jnp.stack(prows), jnp.stack(srows)


def stacks_to_variables(
    plan: PipelinePlan, pstack: jnp.ndarray, sstack: jnp.ndarray
) -> Dict[str, Any]:
    """Exact inverse of :func:`variables_to_stacks` (round-trip tested)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def insert(tree, path, sub):
        for k in path[:-1]:
            tree = tree.setdefault(k, {})
        tree[path[-1]] = sub

    for s, g in enumerate(plan.stage_units):
        ptree = _from_vec(pstack[s], *plan.param_specs[s])
        stree = _from_vec(sstack[s], *plan.stats_specs[s])
        for u in g:
            for sub, path in u.paths.items():
                insert(params, path, ptree[u.name][sub])
                insert(stats, path, stree[u.name][sub])
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# The pipelined forward (shared by embed and the train step).
# ---------------------------------------------------------------------------


def _make_branches(plan: PipelinePlan, train: bool):
    """One callable per stage: (act_in, pvec, svec) ->
    (act_out, desc, new_svec) with uniform padded signatures."""
    cfg = plan.cfg
    wire = jnp.dtype(cfg.compute_dtype)
    branches = []
    for s, g in enumerate(plan.stage_units):
        def branch(act_in, pvec, svec, _s=s, _g=g):
            h = act_in[..., : plan.in_widths[_s]].astype(jnp.float32)
            params = _from_vec(pvec, *plan.param_specs[_s])
            stats = _from_vec(svec, *plan.stats_specs[_s])
            new_stats = dict(stats)
            for u in _g:
                uvars = {"params": params[u.name],
                         "batch_stats": stats[u.name]}
                if train:
                    h, mut = u.module.apply(
                        uvars, h, train=True, mutable=["batch_stats"]
                    )
                    new_stats[u.name] = mut["batch_stats"]
                else:
                    h = u.module.apply(uvars, h, train=False)
            bm = act_in.shape[0]
            if _g[-1].name == "head":
                desc = h.astype(jnp.float32)
                # Dummy activation in the WIRE dtype: act_in is always
                # upcast to f32 (see spmd's tick), so zeros_like(act_in)
                # would emit f32 where every other branch emits the wire
                # dtype — a lax.switch/scan-carry dtype mismatch that
                # broke PP outright under bfloat16 compute (the flagship
                # dtype; latent because the PP tests ran f32 — round-5
                # review follow-up).
                act_out = jnp.zeros(act_in.shape, wire)
            else:
                desc = jnp.zeros((bm, cfg.output_dim), jnp.float32)
                pad = plan.buf_width - h.shape[-1]
                act_out = jnp.pad(
                    h.astype(wire), ((0, 0), (0, 0), (0, pad))
                )
            sv = _to_vec(new_stats)
            return act_out, desc, jnp.pad(
                sv, (0, plan.q_max - sv.shape[0])
            )

        branches.append(branch)
    return branches


def _make_pipeline_spmd(
    plan: PipelinePlan, mesh: Mesh, axis: str, train: bool,
    data_axis: Optional[str] = None,
):
    """The shard_map'd (M + S - 1)-tick schedule. Per-device inputs: this
    stage's (1, P_max)/(1, Q_max) rows and the microbatch stack; outputs:
    the per-stage descriptor buffer (only the last stage's row is
    meaningful) and updated stats rows.

    With ``data_axis`` (DPxPP over a 2-D ``(data, stage)`` mesh) the
    microbatch rows shard over the data axis — each data slice runs the
    same schedule on its rows, the stage stacks are replicated across
    ``data`` (their cotangents psum over it in shard_map's transpose, which
    is the gradient all-reduce), and BatchNorm follows the framework's
    explicit-replica convention (parallel/ddp.py): statistics are computed
    per (microbatch, data slice) and the final stats vectors average across
    replicas once per step."""
    S = plan.num_stages
    branches = _make_branches(plan, train)
    wire = jnp.dtype(plan.cfg.compute_dtype)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def run_stage(stage, act_in, pvec, svec):
        return jax.lax.switch(stage, branches, act_in, pvec, svec)

    if train:
        # GPipe remat: the backward re-runs each stage body instead of
        # keeping every tick's internals (kNN scans, edge tensors) alive.
        run_stage = jax.checkpoint(run_stage, static_argnums=())

    def spmd(prow, srow, inputs):
        stage = jax.lax.axis_index(axis)
        pvec, svec0 = prow[0], srow[0]
        m, bm, n, _ = inputs.shape
        act0 = jnp.zeros((bm, n, plan.buf_width), wire)
        out0 = jnp.zeros((m, bm, plan.cfg.output_dim), jnp.float32)

        def tick(carry, t):
            act, svec, outbuf = carry
            x_t = jax.lax.dynamic_index_in_dim(
                inputs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            # Stage-0 inputs stay f32: quantizing raw coordinates to the
            # bf16 wire (~4e-3 on [-1,1]) would violate the wire-fidelity
            # policy (utils/wire.py keeps even the training wire at
            # ~3e-5). Only the ppermuted inter-stage activations — hidden
            # features already computed in the compute dtype — ride the
            # compact wire.
            x_enc = jnp.pad(
                x_t.astype(jnp.float32),
                ((0, 0), (0, 0), (0, plan.buf_width - x_t.shape[-1])),
            )
            act_in = jnp.where(stage == 0, x_enc, act.astype(jnp.float32))
            act_out, desc, new_svec = run_stage(stage, act_in, pvec, svec)
            if train:
                # Only ticks carrying a real microbatch update BN state.
                valid = (t >= stage) & (t < stage + m)
                svec = jnp.where(valid, new_svec, svec)
            mb = t - (S - 1)
            emit = (stage == S - 1) & (mb >= 0)
            outbuf = jnp.where(
                emit,
                jax.lax.dynamic_update_index_in_dim(
                    outbuf, desc, jnp.clip(mb, 0, m - 1), 0
                ),
                outbuf,
            )
            act = jax.lax.ppermute(act_out, axis, perm)
            return (act, svec, outbuf), None

        (act, svec, outbuf), _ = jax.lax.scan(
            tick, (act0, svec0, out0), jnp.arange(m + S - 1)
        )
        if train and data_axis is not None:
            # Cross-replica stat sync (the DDP convention): the EMA update
            # is affine in the per-tick batch moments, so one pmean of the
            # final vectors equals averaging the moments at every tick.
            svec = jax.lax.pmean(svec, data_axis)
        return outbuf[None], svec[None]

    if data_axis is None:
        in_specs = (P(axis), P(axis), P())
        out_specs = (P(axis), P(axis))
    else:
        in_specs = (P(axis), P(axis), P(None, data_axis))
        out_specs = (P(axis, None, data_axis), P(axis))
    return jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )


def _data_size(mesh: Mesh, data_axis: Optional[str]) -> int:
    """Pipeline-replica count on ``data_axis`` (1 when None), with a
    friendly error instead of a bare KeyError for a mesh without it."""
    if data_axis is None:
        return 1
    if data_axis not in mesh.axis_names:
        raise ValueError(
            f"data_axis={data_axis!r} not in mesh axes {mesh.axis_names}"
        )
    return int(mesh.shape[data_axis])


def _check_dp(
    mesh: Mesh, data_axis: Optional[str], rows: int, what: str
) -> None:
    d = _data_size(mesh, data_axis)
    if rows % d:
        raise ValueError(
            f"{what}={rows} not divisible by the {d} pipeline replicas "
            f"on mesh axis {data_axis!r}"
        )


def make_pp_mesh(
    num_stages: int, axis: str = "stage",
    data: int = 1, data_axis: str = "data",
) -> Mesh:
    """A ``('stage',)`` pipeline mesh, or — with ``data > 1`` — a 2-D
    ``(data, stage)`` mesh whose rows are data-parallel pipeline replicas
    (DPxPP). Stage-sharded stacks (``P(axis)``) replicate across ``data``
    on either shape."""
    devices = jax.devices()
    need = num_stages * data
    if need > len(devices):
        raise ValueError(
            f"need {need} devices ({data} data x {num_stages} stages), "
            f"have {len(devices)}"
        )
    if data == 1:
        return Mesh(np.asarray(devices[:num_stages]), (axis,))
    from lpdnet_tpu.parallel.tp import make_mesh_2d

    return make_mesh_2d(data, num_stages, (data_axis, axis))


def _put_named(arr, sh: NamedSharding):
    """Place a host value under a NamedSharding, multi-process-safe: every
    process holds the same host value (deterministic init / restored
    standard payload) and assembles the global array from its addressable
    shards — ``jax.device_put`` to a sharding containing other processes'
    devices is not allowed (same pattern as tp.shard_state)."""
    if jax.process_count() > 1:
        host = np.asarray(arr)
        return jax.make_array_from_callback(
            host.shape, sh, lambda idx: host[idx]
        )
    return jax.device_put(arr, sh)


def place_stacks(
    plan: PipelinePlan,
    mesh: Mesh,
    variables: Dict[str, Any],
    axis: str = "stage",
) -> Tuple[jax.Array, jax.Array]:
    """Stage-shard the stacks over the mesh (row s on stage-device s)."""
    pstack, sstack = variables_to_stacks(plan, variables)
    sh = NamedSharding(mesh, P(axis))
    return _put_named(pstack, sh), _put_named(sstack, sh)


def make_pp_embed_fn(
    plan: PipelinePlan,
    mesh: Mesh,
    microbatch_size: int,
    axis: str = "stage",
    data_axis: Optional[str] = None,
) -> Callable[[jax.Array, jax.Array, jnp.ndarray], jnp.ndarray]:
    """Pipelined inference embed: ``(B, N, C) -> (B, output_dim)`` with B
    split into ``B / microbatch_size`` microbatches streaming through the
    stages. Descriptors match the monolithic forward (same math, staged).
    With ``data_axis`` (a 2-D DPxPP mesh) each microbatch's rows shard
    over the pipeline replicas."""
    _check_dp(mesh, data_axis, microbatch_size, "microbatch_size")
    pipeline = _make_pipeline_spmd(
        plan, mesh, axis, train=False, data_axis=data_axis
    )

    @jax.jit
    def embed(pstack, sstack, points):
        from lpdnet_tpu.utils.wire import decode_points

        points = decode_points(points)  # reduced-precision wire -> f32
        b, n, c = points.shape
        if b % microbatch_size:
            raise ValueError(
                f"batch {b} not divisible by microbatch {microbatch_size}"
            )
        if c != plan.in_widths[0]:
            raise ValueError(
                f"pipeline plan expects {plan.in_widths[0]}-channel inputs "
                f"(build_plan input_width), got {c} — a mismatch would "
                "silently truncate or garbage-pad stage 0"
            )
        inputs = points.reshape(b // microbatch_size, microbatch_size, n, c)
        outbuf, _ = pipeline(pstack, sstack, inputs)
        return outbuf[-1].reshape(b, plan.cfg.output_dim)

    return embed


# ---------------------------------------------------------------------------
# Pipelined training.
# ---------------------------------------------------------------------------


class PPTrainState(struct.PyTreeNode):
    """Train state over the stage stacks (sharded P('stage') on the mesh)."""

    step: jax.Array
    pstack: jax.Array
    sstack: jax.Array
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)


def create_pp_train_state(
    plan: PipelinePlan,
    mesh: Mesh,
    variables: Dict[str, Any],
    train_cfg: TrainConfig,
    examples_per_step: Optional[int] = None,
    axis: str = "stage",
) -> PPTrainState:
    pstack, sstack = place_stacks(plan, mesh, variables, axis)
    tx = make_optimizer(train_cfg, examples_per_step)
    # Adam over the stacked buffer is elementwise, so it equals per-leaf
    # Adam on the unstacked pytree; padded entries have zero grads and
    # stay exactly zero. jit propagates pstack's stage sharding into the
    # moment buffers.
    opt_state = jax.jit(tx.init)(pstack)
    return PPTrainState(
        step=jnp.zeros((), jnp.int32),
        pstack=pstack,
        sstack=sstack,
        opt_state=opt_state,
        tx=tx,
    )


def make_pp_train_step(
    plan: PipelinePlan,
    loss_cfg: LossConfig,
    mesh: Mesh,
    microbatches: int,
    axis: str = "stage",
    data_axis: Optional[str] = None,
    donate: bool = True,
):
    """Pipelined train step: the tuple batch flattens to ``B*(1+P+M+1)``
    submaps, streams through the stages as ``microbatches`` microbatches,
    and the quadruplet loss is computed over the collected descriptors;
    one ``jax.grad`` differentiates the whole schedule. With ``data_axis``
    (DPxPP) the microbatch rows shard over the pipeline replicas; the loss
    stays global (GSPMD computes it over the full descriptor batch), so
    the semantics match the 1-D pipeline up to the per-replica BatchNorm
    statistics documented on :func:`_make_pipeline_spmd`."""
    ndata = _data_size(mesh, data_axis)
    pipeline = _make_pipeline_spmd(
        plan, mesh, axis, train=True, data_axis=data_axis
    )

    def step(state: PPTrainState, batch):
        flat, p, m = _flatten_tuples(batch)
        bt, n, c = flat.shape
        if bt % microbatches or (bt // microbatches) % ndata:
            raise ValueError(
                f"flat tuple batch {bt} not divisible by "
                f"microbatches={microbatches}"
                + (f" x data replicas={ndata}" if ndata > 1 else "")
            )
        if (bt // microbatches) // ndata < 2:
            raise ValueError(
                f"train microbatches of {(bt // microbatches) // ndata} "
                "submap per replica: a train-mode forward over a single "
                "submap zeroes every batch-axis BatchNorm (the NetVLAD "
                "hidden/gating BNs normalize over the batch dimension), "
                "silently collapsing all descriptors — use fewer "
                "microbatches or a larger batch"
            )
        if c != plan.in_widths[0]:
            raise ValueError(
                f"pipeline plan expects {plan.in_widths[0]}-channel inputs "
                f"(build_plan input_width), got {c}"
            )
        inputs = flat.reshape(microbatches, bt // microbatches, n, c)
        b = batch["query"].shape[0]
        t = 1 + p + m + 1

        def loss_fn(pstack):
            outbuf, new_sstack = pipeline(pstack, state.sstack, inputs)
            desc = outbuf[-1].reshape(b, t, -1)
            loss = loss_from_config(
                loss_cfg, desc[:, 0], desc[:, 1:1 + p],
                desc[:, 1 + p:1 + p + m], desc[:, -1],
            )
            return loss, new_sstack

        (loss, new_sstack), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.pstack)
        updates, new_opt = state.tx.update(
            grads, state.opt_state, state.pstack
        )
        return state.replace(
            step=state.step + 1,
            pstack=optax.apply_updates(state.pstack, updates),
            sstack=new_sstack,
            opt_state=new_opt,
        ), loss

    return jax.jit(
        step,
        donate_argnums=(0,) if donate else (),
        compiler_options=_tpu_compiler_options(),
    )


# ---------------------------------------------------------------------------
# Training-loop integration (train/loop.py with MeshConfig.pipeline_stages):
# microbatch sizing, the sweeps' variables-dict embed surface, and LOSSLESS
# conversion between PPTrainState and the standard TrainState so pipelined
# runs checkpoint/resume through the same payload as every other path.
# ---------------------------------------------------------------------------


def pick_microbatches(
    total: int, stages: int, requested: int = 0, row_divisor: int = 1,
    min_rows: int = 1,
) -> int:
    """Number of microbatches for a ``total``-item batch on ``stages``
    stages: ``requested`` if given (must divide), else the smallest divisor
    >= 2*stages (bubble fraction (S-1)/(m+S-1) <= ~1/3), else ``total``.
    ``row_divisor`` (DPxPP): each microbatch's rows must additionally split
    over that many pipeline replicas. ``min_rows``: minimum rows per
    replica per microbatch — the TRAIN pick uses 2, because a train-mode
    forward over a single submap zeroes every batch-axis BatchNorm
    (``x - mean(x)`` over one row: the NetVLAD hidden/gating BNs), which
    silently collapses all descriptors to 0."""

    def fits(m):
        return (
            total % m == 0
            and (total // m) % row_divisor == 0
            and (total // m) // row_divisor >= min_rows
        )

    if requested:
        if not fits(requested):
            raise ValueError(
                f"pipeline_microbatches={requested} does not divide the "
                f"batch ({total}) into microbatches of a multiple of "
                f"{row_divisor} rows with >= {min_rows} rows per replica"
            )
        return requested
    for m in range(min(2 * stages, total), total):
        if fits(m):
            return m
    if fits(total):
        return total
    # With a row divisor / minimum, a bubble-heavier count below 2*stages
    # may be the only one whose microbatches still fit.
    for m in range(min(2 * stages, total) - 1, 0, -1):
        if fits(m):
            return m
    raise ValueError(
        f"batch ({total}) cannot split into microbatches with rows "
        f"divisible by {row_divisor} pipeline replicas"
        + (f" and >= {min_rows} rows per replica" if min_rows > 1 else "")
    )


def make_pp_sweep_embed_fn(
    plan: PipelinePlan, mesh: Mesh, batch_size: int, axis: str = "stage",
    data_axis: Optional[str] = None,
):
    """The sweeps' ``embed_fn(variables, points)`` surface over the
    pipeline: ``variables`` is the opaque dict the loop's ``model_vars``
    produces — for PP that is the live stage stacks."""
    ndata = _data_size(mesh, data_axis)
    m = pick_microbatches(batch_size, plan.num_stages, row_divisor=ndata)
    embed = make_pp_embed_fn(plan, mesh, batch_size // m, axis, data_axis)

    def embed_vars(variables, points):
        return embed(variables["pstack"], variables["sstack"], points)

    return embed_vars


def _map_stack_leaves(opt_state, fn, stack_shape):
    """Apply ``fn`` to every opt-state leaf shaped like the param stack
    (Adam moments, SGD trace, ...), passing scalars (counts) through."""

    def cv(leaf):
        arr = jnp.asarray(leaf)
        if arr.shape == tuple(stack_shape):
            return fn(leaf)
        return leaf

    return jax.tree_util.tree_map(cv, opt_state)


def _walk_param_containers(node, fn):
    """Rebuild an optax state, replacing each embedded params-tree (the
    only dict-valued nodes optax states carry) via ``fn``; scalar leaves
    and (named)tuples pass through structurally."""
    if isinstance(node, dict) or type(node).__name__ == "FrozenDict":
        return fn(node)
    if isinstance(node, tuple):
        children = [_walk_param_containers(c, fn) for c in node]
        if hasattr(node, "_fields"):  # NamedTuple (optax states)
            return type(node)(*children)
        return tuple(children)
    return node


def pp_to_train_state(plan: PipelinePlan, pp_state: PPTrainState, template):
    """PPTrainState -> standard TrainState (host-comparable, standard
    checkpoint payload). Exact: stacking is concat+pad of f32 leaves, and
    padded lanes hold zeros in params and moments alike."""
    stats_fill = template.batch_stats
    variables = stacks_to_variables(plan, pp_state.pstack, pp_state.sstack)

    def unstack_params(stack):
        return stacks_to_variables(plan, stack, pp_state.sstack)["params"]

    opt_state = _map_stack_leaves(
        pp_state.opt_state, unstack_params, pp_state.pstack.shape
    )
    del stats_fill
    return template.replace(
        step=pp_state.step,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
    )


def pp_from_train_state(
    plan: PipelinePlan, mesh: Mesh, state, axis: str = "stage"
) -> PPTrainState:
    """Standard TrainState -> PPTrainState on the stage mesh (the exact
    inverse of :func:`pp_to_train_state`; round-trip tested)."""
    pstack, sstack = place_stacks(
        plan, mesh,
        {"params": state.params, "batch_stats": state.batch_stats}, axis,
    )
    sh = NamedSharding(mesh, P(axis))
    zero_stats = jax.tree_util.tree_map(np.zeros_like, state.batch_stats)

    def stack_params(tree):
        stack, _ = variables_to_stacks(
            plan, {"params": tree, "batch_stats": zero_stats}
        )
        return _put_named(stack, sh)

    opt_state = _walk_param_containers(state.opt_state, stack_params)
    # Scalar leaves (Adam/schedule counts, step) must be committed to the
    # stage mesh too: a restored checkpoint's leaves are committed to the
    # default device, and jit refuses mixed committed placements.
    rep = NamedSharding(mesh, P())
    stack_shape = tuple(pstack.shape)

    def place_scalar(leaf):
        arr = jnp.asarray(leaf)
        if arr.shape == stack_shape:
            return leaf  # already placed by stack_params
        return _put_named(arr, rep)

    opt_state = jax.tree_util.tree_map(place_scalar, opt_state)
    return PPTrainState(
        step=_put_named(jnp.asarray(state.step, jnp.int32), rep),
        pstack=pstack,
        sstack=sstack,
        opt_state=opt_state,
        tx=state.tx,
    )
