"""LPD-Net feature trunk: per-point MLP + dual-graph neighbourhood aggregation.

Reference: the LPD feature net (``models`` ``knn`` / ``get_graph_feature`` /
LPD module — SURVEY C11, corroborated by BASELINE.json and the LPD-Net ICCV'19
paper): a shared MLP over the 13-D input (xyz + 10 handcrafted features),
then DGCNN-style edge convolutions with max aggregation over kNN graphs built
in BOTH Cartesian (xyz) space and learned-feature space, producing 1024-D
per-point features for NetVLAD.

TPU-native design: both graphs come from the blockwise kNN op (tiled
distance + top-k, Pallas on the hot path); edge convs are Dense layers on
the (B, N, k, C) edge tensor, which XLA tiles onto the MXU, fused with the
max-over-neighbours reduction.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.knn import knn_indices
from lpdnet_tpu.ops.lse import knn_lse_aggregate
from lpdnet_tpu.ops.pallas.edge_gather import edge_max_gather_trainable
from lpdnet_tpu.ops.pallas.lse_fused import (
    fused_lse_supported,
    lse_aggregate_fused,
)
from lpdnet_tpu.models.pointnet import PointMLP


def knn_dist_dtype(dtype) -> str:
    """Distance-matrix dtype for the trunk's kNN scans: bf16 compute keeps
    the (blocked) pairwise distances in bf16 too; anything else stays f32.
    Shared by the monolithic trunk and the pipelined stages (parallel/pp.py)."""
    return "bfloat16" if jnp.dtype(dtype) == jnp.bfloat16 else "float32"


def make_lse_agg(
    space,
    *,
    k: int,
    t0: float,
    block: int,
    window,
    recall_target: float,
    exact: bool,
    dist_dtype: str,
    std_fn=None,
    levels: int = 2,
    kth=None,
    tie_correction: bool = False,
    fused: bool = False,
):
    """Build the gather-free LSE ``agg_fn`` for one EdgeConv (ops/lse.py).

    SHARED by the monolithic trunk (LPDNetFeat), the pipelined stages
    (parallel/pp.py), and point-parallel serving (parallel/sp.py) so the
    aggregation policy can never drift between the paths.  ``std_fn``
    (values -> (B, 1, C) std) overrides the op's internal whole-submap
    channel std — SP passes a psum-over-shards reduction there.
    ``fused`` routes to the Pallas kernel twin
    (ops/pallas/lse_fused.py — callers gate it via ``lse_fused_enabled``;
    same semantics, exact in-kernel bf16 kth search instead of
    ``approx_min_k``).
    """
    def agg(values):
        std = None if std_fn is None else std_fn(values)
        if fused:
            return lse_aggregate_fused(
                space, values, k, t0=t0, tile=block, window=window,
                levels=levels, tie_correction=tie_correction, std=std,
                kth=kth,
            )
        return knn_lse_aggregate(
            space, values, k, t0=t0, block=block, window=window,
            recall_target=recall_target, exact=exact,
            dist_dtype=dist_dtype, std=std, levels=levels, kth=kth,
            tie_correction=tie_correction,
        )
    # NOT remat'd: jax.checkpoint(agg) measured 1223 -> 1039 submaps/s
    # on the train bench (docs/PERF_LOG.md round 4) — the backward
    # recompute does not fuse block-locally on this backend, so it
    # doubles scan work without saving the residual traffic it targets.
    return agg


def lse_fused_enabled(cfg, window) -> bool:
    """Shared policy: route the trunk's LSE aggregations through the
    fused Pallas kernel (ops/pallas/lse_fused.py)?

    ``window`` is the trunk's resolved Morton window (the caller passes
    ``knn_window_policy(cfg)`` — models/model.py).  Static gates: the LSE
    path itself, non-exact kNN, bf16 compute (the kernel masks in the
    scan path's bf16 value space), and kernel-aligned geometry
    (``fused_lse_supported``).  ``'on'`` raises when a static gate fails
    instead of silently taking the scan path, and trusts the backend
    (the kernel is TPU-only; CPU tests wrap the forward in
    ``pltpu.force_tpu_interpret_mode``).  The default is 'off' — a
    measured throughput negative at the shipped geometry, kept as the
    exact-selection escape hatch (docs/PERF_LOG.md round 5)."""
    if cfg.lse_fused == "off":
        return False
    resolved = cfg.resolved_aggregation
    ok = (
        resolved == "lse"
        and not cfg.exact_knn
        and jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
        and fused_lse_supported(
            n=cfg.num_points, tile=cfg.features.knn_block, window=window,
            exclude_self=False, exact=False, dist_dtype="bfloat16",
        )
    )
    if not ok:
        raise ValueError(
            "model.lse_fused='on' but the fused kernel's static gates "
            f"fail (aggregation resolves to {resolved!r}, "
            f"exact_knn={cfg.exact_knn}, "
            f"compute_dtype={cfg.compute_dtype!r}, "
            f"num_points={cfg.num_points}, "
            f"knn_block={cfg.features.knn_block}, window={window}); "
            "drop the override to use the XLA scan (ops/lse.py)"
        )
    return True


def lse_reuse_kth(cfg) -> bool:
    """Shared policy (monolithic / PP stages / SP shards must agree, or
    staged-vs-monolithic parity breaks): the spatial LSE graph reuses the
    feature stage's k-th distance when the graphs coincide (same k) AND
    the stages round distances compatibly — the feature stage always
    masks bf16 distances on the approx path, so reuse needs the trunk's
    dist_dtype to be bf16 too (bf16 compute) or both to be exact-f32.
    Exact thresholds match the internal selection bitwise; approx ones
    are ulp-inflated inside ops/lse.py (near-superset mask — XLA can
    round the two programs' bf16 tiles apart by ~1 ulp)."""
    return (
        cfg.resolved_aggregation == "lse"
        and cfg.compute_features_on_device
        and cfg.features.k == cfg.graph_k
        and not cfg.features.fused_stats
        and (
            cfg.exact_knn
            or jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
        )
    )


class EdgeConv(nn.Module):
    """Shared MLP over ``[x_j - x_i, x_i]`` edges + max over neighbours.

    TPU optimization: the edge Dense is linear, so
    ``W @ [x_j - x_i, x_i] = W1 x_j + (W2 - W1) x_i`` with
    ``W = [W1; W2]``. Both projections are computed ONCE per *point*
    (two (B,N,C)@(C,width) MXU matmuls) instead of once per *edge*
    ((B,N,k,2C)@(2C,width)) — a k-fold FLOP cut — and the k-wide gather
    moves ``width`` channels instead of ``2C``. Parameters are identical
    to the naive concat formulation (same kernel layout), verified by
    ``tests/test_models.py::test_edgeconv_decomposition_matches_naive``.
    """

    width: int
    dtype: jnp.dtype = jnp.float32
    # 'post': BatchNorm after the max aggregation (B, N, C) — the TPU-fast
    #   default. For positive BN scales (the trained norm), relu and the
    #   affine commute with max: relu(bn(max_j(a_j) + b_i)) ==
    #   max_j relu(bn(a_j + b_i)); training statistics also differ
    #   (per-point instead of per-edge), so this is a deliberate design
    #   variant, not a bit-exact rewrite. With the max directly consuming
    #   the gather, XLA fuses them and the (B, N, k, C) edge tensor never
    #   reaches HBM.
    # 'edge': BatchNorm on the per-edge tensor before relu/max — the
    #   reference's literal conv-BN-relu-max placement (SURVEY C11), used
    #   by the parity oracle.
    bn_placement: str = "post"
    # Use the Pallas aligned-slab max-gather kernel (~3.4x XLA's row gather
    # on v5e) for the aggregation, in inference AND training (the custom
    # VJP runs an eq-mask scatter backward kernel). Requires N % 16 == 0;
    # other point counts silently fall back to the XLA gather.
    pallas_gather: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        idx: jnp.ndarray | None,
        train: bool = False,
        agg_fn=None,
    ) -> jnp.ndarray:
        # x: (B, N, C), idx: (B, N, k) -> (B, N, width)
        #
        # ``agg_fn`` (optional): a callable (B, N, width) -> (B, N, width)
        # that max-aggregates per-point values over each point's
        # neighbourhood WITHOUT an index list (the gather-free LSE matmul
        # path — ops/lse.py). When given, ``idx`` is unused and may be
        # None; parameters are identical either way, so checkpoints are
        # interchangeable between aggregation modes.
        c = x.shape[-1]
        x = x.astype(self.dtype)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2 * c, self.width),
            jnp.float32,
        )
        w_nbr = kernel[:c]  # multiplies (x_j - x_i): contributes W1 x_j
        w_ctr = kernel[c:]  # multiplies x_i
        proj_nbr = jnp.einsum(
            "bnc,cd->bnd", x, w_nbr.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        proj_ctr = jnp.einsum(
            "bnc,cd->bnd", x, (w_ctr - w_nbr).astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        bn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=jnp.float32 if train else self.dtype, name="bn",
        )
        if self.bn_placement == "post":
            if agg_fn is not None:
                agg = agg_fn(proj_nbr)
            elif self.pallas_gather and x.shape[1] % 16 == 0:
                # Differentiable in training too: custom VJP runs the
                # eq-mask scatter backward as a Pallas kernel. The kernel
                # needs SLAB-aligned N; other shapes take the XLA path.
                agg = edge_max_gather_trainable(proj_nbr, idx)
            else:
                agg = jnp.max(gather_neighbors(proj_nbr, idx), axis=2)
            return nn.relu(bn(agg + proj_ctr))
        elif self.bn_placement == "edge":
            if agg_fn is not None:
                raise ValueError(
                    "agg_fn (LSE aggregation) requires bn_placement='post' — "
                    "the 'edge' parity path needs the per-edge tensor"
                )
            e = gather_neighbors(proj_nbr, idx) + proj_ctr[:, :, None, :]
            return jnp.max(nn.relu(bn(e)), axis=2)
        raise ValueError(f"unknown bn_placement: {self.bn_placement!r}")


class LPDNetFeat(nn.Module):
    """(B, N, 13) -> (B, N, feature_dim) per-point features.

    Stages:
      1. shared MLP 13 -> 64 -> 64 on the augmented points;
      2. EdgeConv over the **Cartesian-space** kNN graph (built from the xyz
         columns of the input) -> 64;
      3. EdgeConv over the **feature-space** kNN graph (rebuilt from the
         current learned features) -> 128;
      4. shared MLP 128 -> 256 -> feature_dim.
    """

    feature_dim: int = 1024
    k: int = 20
    pre_widths: Sequence[int] = (64, 64)
    spatial_width: int = 64
    feature_width: int = 128
    post_widths: Sequence[int] = (256,)
    knn_block: int = 1024
    dtype: jnp.dtype = jnp.float32
    edge_bn_placement: str = "post"
    pallas_gather: bool = False
    recall_target: float = 0.95
    exact_knn: bool = False
    # Morton-window half-width for both graph searches (requires
    # Morton-sorted input points — the caller sorts; see ModelConfig).
    # The feature-space graph is windowed in the SAME sorted order: learned
    # features are spatially smooth, so their neighbours stay index-local
    # (measured ~98% recall at 512 on submap-like clouds).
    knn_window: int | None = None
    # Neighbour aggregation: 'max' = select + gather + hard max (Pallas
    # slab kernel on the hot path); 'lse' = gather-free smooth max via
    # masked log-sum-exp matmuls on the MXU (ops/lse.py) — the selection's
    # k-th distance masks the SAME distance tile and the aggregation (and
    # its backward) become matmuls. Requires edge_bn_placement='post'.
    aggregation: str = "max"
    lse_t0: float = 24.0
    lse_levels: int = 2
    lse_tie_correction: bool = False
    # Route LSE aggregations through the fused Pallas kernel (resolved by
    # the caller via ``lse_fused_enabled`` — TPU-only, bf16, aligned
    # geometry).
    lse_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        idx_xyz: jnp.ndarray | None = None,
        lse_std_fn=None,
        lse_kth_xyz: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        # ``lse_std_fn`` (call-time, optional): values -> (B, 1, C) std
        # override for the LSE temperature — point-parallel callers
        # (parallel/sp.py) pass a psum-over-shards reduction so sharded
        # and single-device temperatures match. Ignored under 'max'.
        xyz = x[..., :3]
        h = PointMLP(
            list(self.pre_widths), relu_last=True, dtype=self.dtype,
            name="pre",
        )(x, train=train)
        # Graph 1: neighbourhoods in Cartesian space (fixed geometry). The
        # on-device feature stage already ran this exact kNN search —
        # ``idx_xyz`` reuses it instead of paying for a second one.
        dist_dtype = knn_dist_dtype(self.dtype)
        if self.aggregation == "lse":
            # Gather-free path: EdgeConv aggregates via the masked-LSE
            # matmul closed over the graph's metric space; no index lists.
            def lse_over(space, kth=None):
                return make_lse_agg(
                    space, k=self.k, t0=self.lse_t0,
                    block=self.knn_block, window=self.knn_window,
                    recall_target=self.recall_target, exact=self.exact_knn,
                    dist_dtype=dist_dtype, std_fn=lse_std_fn,
                    levels=self.lse_levels, kth=kth,
                    tie_correction=self.lse_tie_correction,
                    fused=self.lse_fused,
                )
            # ``lse_kth_xyz``: the caller's feature stage already scanned
            # the xyz space — its k-th distance re-masks the SAME metric
            # here and the spatial graph skips its own selection.
            h = EdgeConv(
                self.spatial_width, dtype=self.dtype,
                bn_placement=self.edge_bn_placement, name="edge_spatial",
            )(h, None, train=train, agg_fn=lse_over(xyz, kth=lse_kth_xyz))
            h = EdgeConv(
                self.feature_width, dtype=self.dtype,
                bn_placement=self.edge_bn_placement, name="edge_feature",
            )(h, None, train=train, agg_fn=lse_over(h))
        else:
            if idx_xyz is None:
                idx_xyz = knn_indices(
                    xyz, self.k, block=self.knn_block, dist_dtype=dist_dtype,
                    recall_target=self.recall_target, exact=self.exact_knn,
                    window=self.knn_window,
                )
            h = EdgeConv(
                self.spatial_width, dtype=self.dtype,
                bn_placement=self.edge_bn_placement,
                pallas_gather=self.pallas_gather, name="edge_spatial",
            )(h, idx_xyz, train=train)
            # Graph 2: neighbourhoods rebuilt in learned-feature space.
            idx_feat = knn_indices(
                h, self.k, block=self.knn_block, dist_dtype=dist_dtype,
                recall_target=self.recall_target, exact=self.exact_knn,
                window=self.knn_window,
            )
            h = EdgeConv(
                self.feature_width, dtype=self.dtype,
                bn_placement=self.edge_bn_placement,
                pallas_gather=self.pallas_gather, name="edge_feature",
            )(h, idx_feat, train=train)
        h = PointMLP(
            list(self.post_widths) + [self.feature_dim],
            relu_last=False,
            dtype=self.dtype,
            name="post",
        )(h, train=train)
        return h
