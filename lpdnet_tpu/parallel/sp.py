"""Point-axis (sequence) parallelism: one submap sharded over the mesh.

The reference has nothing like this (its only parallelism replicates the
whole model per GPU — SURVEY C20); this is the point-cloud analogue of
sequence parallelism for the TPU build (SURVEY §5 "long-context" row, taken
from blockwise-within-a-chip to blocks-across-chips): a latency path that
embeds a SINGLE submap across all chips of a slice.

How it shards — the Morton-window property does all the work:
  * the submap is Morton-sorted (``ops/morton.py``) and every kNN
    candidate scan is restricted to ±w sorted rows — the same
    approximation the single-device windowed forward already makes
    (``ModelConfig.knn_window``), NOT an exact-kNN guarantee: windowed
    neighbour recall is a MEASURED ~96-98% on submap-like clouds for the
    Cartesian graphs, and the learned-feature-space graph staying
    index-local is likewise an empirical property of feature smoothness
    (~98% of its neighbours fall inside the window in the ops/morton.py
    measurements), not a theorem;
  * each device takes a contiguous block of N/D sorted rows plus a w-row
    HALO on each side — under that window approximation the halo covers
    every candidate its block scans, for the feature stage and both
    trunk graphs;
  * the feature stage + LPD trunk run fully locally on the (N/D + 2w)-row
    window (halo rows are recomputed by both neighbours — the standard
    halo-redundancy trade);
  * NetVLAD is the only cross-device op: per-device PARTIAL soft-assigned
    residual sums over its center rows, one ``lax.psum`` over the mesh,
    then the (tiny, replicated) normalize/project/gate tail.

Numerics match the single-device Morton-window model (same candidate
windows when ``block == N/D`` and the same ``w``) up to halo-row boundary
effects and f32 sum order; the parity test pins cosine > 0.999.

Inference-only by design: this is the serving-latency path (training wants
batch/tensor parallelism — ``train/step.py`` / ``parallel/tp.py``).

DPxSP: ``make_sp_mesh(points, data=D)`` builds a 2-D ``(data, points)``
mesh of D point-parallel groups; the batch shards over ``data`` while each
group SP-shards its rows' point axis (the NetVLAD psum stays inside the
group). The latency/throughput dial for batched serving: D=1 is pure SP
(lowest latency), D=ndev is pure DP (highest throughput).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lpdnet_tpu.configs import ModelConfig
from lpdnet_tpu.models.lpdnet import LPDNetFeat, lse_reuse_kth
from lpdnet_tpu.ops.features import eigen_features_and_knn
from lpdnet_tpu.ops.morton import morton_sort
from lpdnet_tpu.ops.netvlad import netvlad_finalize, netvlad_partial


def _bn_affine(x, params, stats, eps=1e-5):
    inv = jax.lax.rsqrt(stats["var"] + eps)
    return (x - stats["mean"]) * inv * params["scale"] + params["bias"]


def _assignment_logits(x, params, stats, add_batch_norm: bool):
    """The NetVLADLoupe logits from inference params (Dense then BN affine
    or bias — models/netvlad.py placement); the aggregation math itself is
    the shared ops (netvlad_partial/netvlad_finalize)."""
    logits = x @ params["cluster_weights"]["kernel"]
    if add_batch_norm:
        return _bn_affine(logits, params["cluster_bn"], stats["cluster_bn"])
    return logits + params["cluster_weights"]["bias"]


def _head_tail(
    flat, params, stats, gating: bool, post_projection_bn: bool,
    add_batch_norm: bool,
):
    """The replicated tail after netvlad_finalize: projection (+bn2),
    context gating (NetVLADLoupe semantics, models/netvlad.py)."""
    out = flat @ params["hidden1_weights"]["kernel"]
    if post_projection_bn:
        out = _bn_affine(out, params["hidden1_bn"], stats["hidden1_bn"])
    else:
        out = out + params["hidden1_weights"]["bias"]
    if gating:
        g = params["context_gating"]
        gs = stats.get("context_gating", {})
        gates = out @ g["gating_weights"]["kernel"]
        if add_batch_norm:
            gates = _bn_affine(gates, g["gating_bn"], gs["gating_bn"])
        else:
            gates = gates + g["gating_weights"]["bias"]
        out = out * jax.nn.sigmoid(gates)
    return out


def make_sp_mesh(
    points: int, data: int = 1,
    axis: str = "points", data_axis: str = "data",
) -> Mesh:
    """A 1-D ``('points',)`` SP mesh, or — with ``data > 1`` — a 2-D
    ``(data, points)`` mesh of ``data`` point-parallel groups (DPxSP):
    each group SP-shards its slice of the batch, trading some of SP's
    latency win for batch throughput. (The 2-D case is tp.make_mesh_2d
    with the point axis in the ICI-adjacent position, where the NetVLAD
    psum belongs.)"""
    if data == 1:
        devices = jax.devices()
        if points > len(devices):
            raise ValueError(
                f"need {points} devices, have {len(devices)}"
            )
        return Mesh(np.asarray(devices[:points]), (axis,))
    from lpdnet_tpu.parallel.tp import make_mesh_2d

    return make_mesh_2d(data, points, (data_axis, axis))


def make_sp_embed_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    variables: Dict[str, Any],
    axis: str = "points",
    data_axis: Optional[str] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Point-parallel descriptor extraction ``(B, N, 3) -> (B, output_dim)``.

    The mesh is 1-D over ``axis``; N must divide by the mesh size and
    the per-device block must be a multiple of 8. ``variables`` is the
    ordinary trained model tree (params + batch_stats) — the SAME
    parameters drive the sharded forward. With ``data_axis`` (a 2-D
    DPxSP mesh from :func:`make_sp_mesh`) the batch additionally shards
    over ``data`` point-parallel groups — the NetVLAD psum stays within
    each group (the ``axis`` collective only), so groups never
    synchronize with each other."""
    if cfg.trunk != "lpdnet" or not cfg.compute_features_on_device:
        raise ValueError(
            "sp embed supports the flagship on-device-features LPD path"
        )
    if cfg.exact_knn or cfg.features.fused_stats:
        # The single-device model disables windowing under these flags
        # (models/model.py); a windowed SP forward would silently diverge
        # from the audit semantics the flags promise.
        raise ValueError(
            "sp embed is the Morton-window approximate path; exact_knn / "
            "fused_stats configs must use the single-device forward"
        )
    if cfg.lse_fused == "on":
        # The per-shard trunk scans its LOCAL window unwindowed
        # (knn_block=win, knn_window=None) — a different scan geometry
        # than the fused kernel's tile+halo grid; running the XLA scan
        # here while the monolithic model runs the exact-selection kernel
        # would silently break the SP-vs-single-device parity contract.
        raise ValueError(
            "model.lse_fused='on' (the exact-selection audit kernel) is "
            "not supported under point-axis SP; use the single-device or "
            "PP forward for fused-kernel audits"
        )
    ndev = mesh.shape[axis]
    n = cfg.num_points
    if n % ndev:
        raise ValueError(f"num_points={n} not divisible by mesh size {ndev}")
    block = n // ndev
    if block % 8:
        raise ValueError(
            f"per-device block {block} must be a multiple of 8 (sublane "
            f"alignment); use a mesh size dividing num_points/8"
        )
    w = cfg.knn_window or 0
    if w == 0:
        raise ValueError("sp embed needs ModelConfig.knn_window set")
    win = min(block + 2 * w, n)
    dtype = jnp.dtype(cfg.compute_dtype)

    trunk = LPDNetFeat(
        feature_dim=cfg.feature_dim,
        k=cfg.graph_k,
        knn_block=win,  # local window = one tile; scans stay unwindowed
        dtype=dtype,
        edge_bn_placement=cfg.edge_bn_placement,
        pallas_gather=False,  # local windows are small; XLA gather is fine
        recall_target=cfg.features.recall_target,
        exact_knn=cfg.exact_knn,
        knn_window=None,
        aggregation=cfg.resolved_aggregation,
        lse_t0=cfg.lse_t0,
        lse_levels=cfg.lse_levels,
        lse_tie_correction=cfg.lse_tie_correction,
    )
    trunk_vars = {
        "params": variables["params"]["trunk"],
        "batch_stats": variables["batch_stats"]["trunk"],
    }
    nv_params = variables["params"]["netvlad"]
    nv_stats = variables["batch_stats"].get("netvlad", {})

    # Per-device window start rows (same clipping as the windowed scans).
    los = np.clip(np.arange(ndev) * block - w, 0, n - win).astype(np.int32)
    # Center-row offsets of each device's block within its window.
    offs = (np.arange(ndev) * block - los).astype(np.int32)

    def device_fn(pts_win, off):
        # pts_win: (1, B, win, 3) this device's window; off: (1,) center.
        pts = pts_win[0]
        reuse_kth = lse_reuse_kth(cfg)
        out = eigen_features_and_knn(
            pts, cfg.features.k, eps=cfg.features.eps, block=win,
            recall_target=cfg.features.recall_target, exact=cfg.exact_knn,
            return_kth=reuse_kth,
        )
        feats, idx = out[0], out[1]
        kth_xyz = out[2] if reuse_kth else None
        x13 = jnp.concatenate([pts.astype(jnp.float32), feats], axis=-1)
        idx_xyz = idx if cfg.features.k == cfg.graph_k else None
        lse_std_fn = None
        if cfg.resolved_aggregation == "lse":
            # The LSE temperature is a whole-submap channel statistic
            # (ops/lse.py): each shard holds only its window rows, so the
            # std comes from a psum of CENTER-row moments (halo rows are
            # recomputed by neighbours and must not double-count).
            def lse_std_fn(values):
                center = jax.lax.dynamic_slice_in_dim(
                    values, off[0], block, axis=1
                ).astype(jnp.float32)
                # Two-pass (mean-centered) to match the single-device
                # jnp.std exactly: the one-pass E[x^2]-E[x]^2 form loses
                # to catastrophic cancellation when |mean| >> std, which
                # would skew SP's temperature vs the monolithic model
                # (advisor round-4 finding). Costs one extra psum.
                s = jax.lax.psum(jnp.sum(center, 1, keepdims=True), axis)
                mean = s / n
                css = jax.lax.psum(
                    jnp.sum(jnp.square(center - mean), 1, keepdims=True),
                    axis,
                )
                return jnp.sqrt(css / n)
        h = trunk.apply(
            trunk_vars, x13, train=False, idx_xyz=idx_xyz,
            lse_std_fn=lse_std_fn, lse_kth_xyz=kth_xyz,
        )
        center = jax.lax.dynamic_slice_in_dim(h, off[0], block, axis=1)
        center = center.astype(jnp.float32)
        logits = _assignment_logits(
            center, nv_params, nv_stats, cfg.add_batch_norm
        )
        agg, a_sum = netvlad_partial(center, logits)
        agg = jax.lax.psum(agg, axis)
        a_sum = jax.lax.psum(a_sum, axis)
        flat = netvlad_finalize(agg, a_sum, nv_params["cluster_centers"])
        desc = _head_tail(
            flat, nv_params, nv_stats, cfg.gating,
            cfg.post_projection_bn, cfg.add_batch_norm,
        )
        if cfg.normalize_output:
            desc = desc / jnp.sqrt(
                jnp.sum(desc * desc, -1, keepdims=True) + 1e-12
            )
        return desc[None]  # (1, B, D); all devices hold the same descriptor

    if data_axis is None:
        in_specs = (P(axis), P(axis))
        out_specs = P(axis)
    else:
        if data_axis not in mesh.axis_names:
            raise ValueError(
                f"data_axis={data_axis!r} not in mesh axes "
                f"{mesh.axis_names}"
            )
        # wins: (ndev, B, win, 3) — point windows over ``axis``, batch
        # rows over ``data``; offs replicate across data groups.
        in_specs = (P(axis, data_axis), P(axis))
        out_specs = P(axis, data_axis)
    ndata = int(mesh.shape[data_axis]) if data_axis is not None else 1
    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )

    def embed(points):
        if points.ndim != 3 or points.shape[1] != n or points.shape[2] != 3:
            raise ValueError(
                f"expected (B, {n}, 3) clouds (cfg.num_points), got "
                f"{points.shape}"
            )
        if points.shape[0] % ndata:
            raise ValueError(
                f"batch {points.shape[0]} not divisible by the {ndata} "
                f"point-parallel groups on mesh axis {data_axis!r}"
            )
        return _embed(points)

    @jax.jit
    def _embed(points):
        # Sort once globally, slice the per-device windows, shard.
        from lpdnet_tpu.utils.wire import decode_points

        pts = morton_sort(decode_points(points))  # (B, N, 3)
        wins = jnp.stack(
            [pts[:, lo : lo + win] for lo in los], axis=0
        )  # (ndev, B, win, 3)
        descs = sharded(wins, jnp.asarray(offs))  # (ndev, B, D) identical
        return descs[0]

    return embed
