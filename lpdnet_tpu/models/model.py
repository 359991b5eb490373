"""Top-level descriptor network (reference: ``PointNetVlad`` class composing
trunk + NetVLAD — SURVEY C13).

``DescriptorNet`` maps batches of submaps to global descriptors:
``(B, N, C) -> (B, output_dim)``. For the LPD trunk with
``compute_features_on_device=True`` the input is raw xyz ``(B, N, 3)`` and
the handcrafted 10-D feature stage runs inside the jitted forward — the
reference's per-submap host NumPy stage (SURVEY C4) become part of the
compiled graph.

A ``reference_forward`` shim accepts the reference's ``(B, 1, N, C)`` layout.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lpdnet_tpu.configs import ModelConfig
from lpdnet_tpu.models.lpdnet import (
    LPDNetFeat,
    lse_fused_enabled,
    lse_reuse_kth,
)
from lpdnet_tpu.models.netvlad import NetVLADLoupe
from lpdnet_tpu.models.pointnet import PointNetFeat
from lpdnet_tpu.ops.features import eigen_features_and_knn
from lpdnet_tpu.ops.morton import morton_sort


def knn_window_policy(cfg: ModelConfig):
    """Morton-window policy, shared by the monolithic forward and the
    pipelined one (parallel/pp.py): the exact_knn audit path stays
    full/exact, and the fused_stats kernel (a kept negative result)
    predates windowing. Returns the window size or None (full scans)."""
    if cfg.exact_knn or cfg.features.fused_stats:
        return None
    return cfg.knn_window


def use_pallas_gather(cfg: ModelConfig) -> bool:
    """Pallas-gather policy shared by the monolithic and pipelined
    forwards: 'auto' enables the kernels off-CPU."""
    if cfg.pallas_gather == "auto":
        return jax.default_backend() not in ("cpu",)
    return cfg.pallas_gather == "on"


class DescriptorNet(nn.Module):
    """Trunk (PointNet or LPD-Net) + NetVLAD head -> global descriptor."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        if cfg.trunk == "lpdnet":
            use_pallas = use_pallas_gather(cfg)
            # Morton-window kNN: sort the submap by Morton code (the model
            # is permutation-invariant, so only approximate-selection
            # tie-breaks can differ) so every kNN candidate scan can be
            # windowed.
            window = knn_window_policy(cfg)
            if window is not None:
                x = morton_sort(x)
            idx_xyz = None
            kth_xyz = None
            if cfg.compute_features_on_device and x.shape[-1] == 3:
                # Fused feature stage: masked-moment features + the xyz kNN
                # graph from one distance pass; the graph is reused as the
                # trunk's Cartesian graph when the k's line up ('max':
                # the index list; 'lse': the k-th-distance threshold).
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
            trunk_out = LPDNetFeat(
                feature_dim=cfg.feature_dim,
                k=cfg.graph_k,
                knn_block=cfg.features.knn_block,
                dtype=dtype,
                edge_bn_placement=cfg.edge_bn_placement,
                pallas_gather=use_pallas,
                recall_target=cfg.features.recall_target,
                exact_knn=cfg.exact_knn,
                knn_window=window,
                aggregation=cfg.resolved_aggregation,
                lse_t0=cfg.lse_t0,
                lse_levels=cfg.lse_levels,
                lse_tie_correction=cfg.lse_tie_correction,
                lse_fused=lse_fused_enabled(cfg, window),
                name="trunk",
            )(x, train=train, idx_xyz=idx_xyz, lse_kth_xyz=kth_xyz)
        elif cfg.trunk == "pointnetvlad":
            trunk_out = PointNetFeat(
                feature_dim=cfg.feature_dim,
                use_input_transform=cfg.use_input_transform,
                use_feature_transform=cfg.use_feature_transform,
                dtype=dtype,
                name="trunk",
            )(x, train=train)
        else:
            raise ValueError(f"unknown trunk: {cfg.trunk!r}")

        desc = NetVLADLoupe(
            feature_size=cfg.feature_dim,
            cluster_size=cfg.num_clusters,
            output_dim=cfg.output_dim,
            add_batch_norm=cfg.add_batch_norm,
            gating=cfg.gating,
            post_projection_bn=cfg.post_projection_bn,
            dtype=dtype,
            name="netvlad",
        )(trunk_out, train=train)

        if cfg.normalize_output:
            desc = desc / jnp.sqrt(
                jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12
            )
        return desc


def build_model(cfg: ModelConfig) -> DescriptorNet:
    return DescriptorNet(config=cfg)


def init_model(
    cfg: ModelConfig, rng: jax.Array, batch_size: int = 1
) -> Tuple[DescriptorNet, Dict[str, Any]]:
    """Create the model and initialize its variables (params + batch_stats)."""
    model = build_model(cfg)
    c = 3 if (cfg.trunk == "lpdnet" and cfg.compute_features_on_device) else cfg.input_dim
    dummy = jnp.zeros((batch_size, cfg.num_points, c), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables


def reference_forward(
    model: DescriptorNet, variables: Dict[str, Any], x: jnp.ndarray
) -> jnp.ndarray:
    """Compat shim for the reference's ``(B, 1, N, C)`` input layout
    (SURVEY §7: the quirk is not reproduced internally)."""
    if x.ndim == 4:
        x = x[:, 0]
    return model.apply(variables, x, train=False)
