"""Batched handcrafted 10-D eigen-features (the LPD-Net input stage).

The reference computes these per submap on the host in NumPy (reference prep
script / ``loading_pointclouds.py`` — SURVEY C4); here the whole stage is a
single jitted device op over (B, N, 3) batches: blockwise kNN + closed-form
3x3/2x2 eigensolves + elementwise feature math — no host round-trip, no
``eigh`` (SURVEY §7 "Design stance").

Feature list and order (SURVEY C4 / FeatureConfig docstring):
  0 change of curvature  1 omnivariance  2 linearity  3 eigen-entropy
  4 2-D scattering       5 2-D linearity 6 delta-z    7 z-std
  8 local density        9 verticality
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpdnet_tpu.ops.eigen import (
    eigvals_sym2x2,
    eigvals_sym3x3,
    smallest_eigvec_sym3x3,
)
from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.knn import knn_indices_and_dists
from lpdnet_tpu.ops.pairwise import pairwise_sqdist

_FOUR_THIRDS_PI = 4.1887902047863905


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _features_from_stats(
    cov: jnp.ndarray,
    z_max: jnp.ndarray,
    z_min: jnp.ndarray,
    var_z: jnp.ndarray,
    r_k: jnp.ndarray,
    k: int,
    eps: float,
) -> jnp.ndarray:
    """The 10 features from neighbourhood statistics (shared by both the
    gather-based and the masked-moment implementations)."""
    lam = jnp.maximum(eigvals_sym3x3(cov), 0.0)
    lam_sum = jnp.sum(lam, axis=-1)
    safe_sum = jnp.maximum(lam_sum, eps)
    l1, l2, l3 = lam[..., 0], lam[..., 1], lam[..., 2]

    curvature_change = l3 / safe_sum
    omnivariance = jnp.cbrt(jnp.maximum(l1 * l2 * l3, 0.0))
    linearity = (l1 - l2) / jnp.maximum(l1, eps)
    e = lam / safe_sum[..., None]
    entropy = -jnp.sum(e * jnp.log(jnp.maximum(e, eps)), axis=-1)

    lam2d = jnp.maximum(eigvals_sym2x2(cov[..., :2, :2]), 0.0)
    scattering_2d = lam2d[..., 0] + lam2d[..., 1]
    linearity_2d = lam2d[..., 1] / jnp.maximum(lam2d[..., 0], eps)

    delta_z = z_max - z_min
    std_z = jnp.sqrt(jnp.maximum(var_z, 0.0))
    # Raw density k/((4/3)pi r^3) spans ~4 orders of magnitude (up to
    # ~1e3-1e4 on normalized submaps) while every other feature is O(1);
    # fed raw into the first shared Dense it drowns the rest of the input.
    # log1p compresses it to O(1) monotonically (TPU-build deviation from
    # the raw value; ordering information is preserved).
    density = jnp.log1p(
        float(k) / (_FOUR_THIRDS_PI * jnp.maximum(r_k, eps) ** 3 + eps)
    )

    normal = smallest_eigvec_sym3x3(cov, lam[..., 2])
    verticality = 1.0 - jnp.abs(normal[..., 2])

    return jnp.stack(
        [
            curvature_change,
            omnivariance,
            linearity,
            entropy,
            scattering_2d,
            linearity_2d,
            delta_z,
            std_z,
            density,
            verticality,
        ],
        axis=-1,
    )


def _cov_from_moment_sums(sums: jnp.ndarray, cnt: jnp.ndarray):
    """Moment sums [Sx,Sy,Sz,Sxx,Syy,Szz,Sxy,Sxz,Syz,...] + count ->
    (covariance (..., 3, 3), czz)."""
    mean = sums[..., :3] / cnt[..., None]
    raw2 = sums[..., 3:9] / cnt[..., None]  # E[x2,y2,z2,xy,xz,yz]
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    cxx = raw2[..., 0] - mx * mx
    cyy = raw2[..., 1] - my * my
    czz = raw2[..., 2] - mz * mz
    cxy = raw2[..., 3] - mx * my
    cxz = raw2[..., 4] - mx * mz
    cyz = raw2[..., 5] - my * mz
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, cxz], -1),
            jnp.stack([cxy, cyy, cyz], -1),
            jnp.stack([cxz, cyz, czz], -1),
        ],
        axis=-2,
    )
    return cov, czz


@partial(
    jax.jit,
    static_argnames=(
        "k", "block", "exact", "recall_target", "fused_stats", "window",
        "return_kth",
    ),
)
def eigen_features_and_knn(
    points: jnp.ndarray,
    k: int = 20,
    *,
    eps: float = 1e-8,
    block: int = 512,
    exact: bool = False,
    recall_target: float = 0.95,
    fused_stats: bool = False,
    window: Optional[int] = None,
    return_kth: bool = False,
):
    """Gather-free feature stage + the xyz kNN graph in ONE pass.

    TPU-native formulation (SURVEY §7 "Hard parts"): instead of gathering
    each point's k neighbours and forming covariances per point, the
    neighbourhood statistics are **masked-moment matmuls** on the MXU.
    Per query tile:

      1. one (tile, N) distance block (MXU matmul);
      2. ``approx_min_k`` -> neighbour indices (returned, reused as the
         LPD trunk's Cartesian graph) + the k-th distance;
      3. neighbour mask = ``d <= d_k`` -> moments via
         ``mask @ [x, y, z, x^2, ..., yz]`` (one (tile, N) @ (N, 9)
         matmul) -> mean/covariance/z-variance; z extrema via masked
         min/max on the VPU.

    No (B, N, k, C) gather tensor ever exists, and the xyz kNN search is
    shared with the trunk instead of run twice. Ties at the k-th distance
    make the mask slightly larger than k; statistics divide by the true
    mask count, matching an exact-k oracle to ~1e-3.

    With ``window`` set (Morton-sorted input required — see
    ``knn_indices_and_dists``), the distance/mask tiles and the moment
    matmul shrink from (block, N) to (block, block+2*window) — the scan is
    HBM-bound on exactly those buffers.

    Returns:
      (features (B, N, 10) float32, idx (B, N, k) int32), plus the k-th
      squared distance (B, N) float32 (the mask threshold this stage
      used) when ``return_kth`` — the LSE spatial graph reuses it to
      skip its own selection (ops/lse.py ``kth=``).
    """
    pts = points.astype(jnp.float32)
    b, n, _ = pts.shape

    block = min(block, _round_up(n, 8))
    n_pad = _round_up(n, block)
    num_blocks = n_pad // block
    q_pad = jnp.pad(pts, ((0, 0), (0, n_pad - n), (0, 0)))
    q_tiles = q_pad.reshape(b, num_blocks, block, 3).transpose(1, 0, 2, 3)

    win_n = n if window is None else min(block + 2 * window, n)
    if window is not None and win_n >= n:
        window = None
        win_n = n
    if window is not None and k > win_n:
        raise ValueError(
            f"k={k} too large for the candidate window "
            f"(block + 2*window = {win_n}); widen window or block"
        )
    if window is not None:
        los = jnp.asarray(
            np.clip(
                np.arange(num_blocks) * block - window, 0, n - win_n
            ).astype(np.int32)
        )
    else:
        los = jnp.zeros(num_blocks, jnp.int32)

    if fused_stats and window is not None:
        raise ValueError(
            "fused_stats (the phase-split Pallas stats kernel, a documented "
            "negative result) does not support the Morton window"
        )
    if fused_stats and not exact:
        # TPU phase split: a minimal scan produces idx + kth (the selection
        # custom-call can't fuse), then the Pallas kernel recomputes each
        # distance tile in VMEM and emits moment sums / count / z extrema
        # without the tile ever reaching HBM.
        from lpdnet_tpu.ops.pallas.feature_stats import neighborhood_stats

        def sel_body(carry, q_tile):
            d = pairwise_sqdist(q_tile, pts).astype(jnp.bfloat16)
            kd, idx = jax.lax.approx_min_k(
                d, k, recall_target=recall_target
            )
            return carry, (idx.astype(jnp.int32), kd[..., -1])

        _, (idx, kth) = jax.lax.scan(sel_body, None, q_tiles)
        idx = idx.transpose(1, 0, 2, 3).reshape(b, n_pad, k)[:, :n]
        kth = kth.transpose(1, 0, 2).reshape(b, n_pad)[:, :n]
        # kth came from bf16-rounded distances; inflate by one bf16 ulp so
        # the f32 recomputed distance of the k-th neighbour stays inside
        # the mask (count normalization absorbs the odd extra).
        kth32 = kth.astype(jnp.float32) * (1.0 + 2.0**-7)
        # Pad N to the kernel tile; padding points sit 1e3 away so they
        # never enter any real point's mask, and padded rows are sliced off.
        stats_tile = 128
        n_kpad = _round_up(n, stats_tile)
        if n_kpad != n:
            pts_k = jnp.pad(
                pts, ((0, 0), (0, n_kpad - n), (0, 0)),
                constant_values=1e3,
            )
            kth_k = jnp.pad(kth32, ((0, 0), (0, n_kpad - n)))
        else:
            pts_k, kth_k = pts, kth32
        sums, z_max, z_min = neighborhood_stats(
            pts_k, kth_k, tile=stats_tile
        )
        sums = sums[:, :n]
        z_max = z_max[:, :n]
        z_min = z_min[:, :n]
        cnt = jnp.maximum(sums[..., 9], 1.0)
        cov, czz = _cov_from_moment_sums(sums, cnt)
        r_k = jnp.sqrt(jnp.maximum(kth.astype(jnp.float32), 0.0))
        feats = _features_from_stats(cov, z_max, z_min, czz, r_k, k, eps)
        if return_kth:
            return feats, idx, kth32
        return feats, idx

    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    moments = jnp.stack(
        [x, y, z, x * x, y * y, z * z, x * y, x * z, y * z], axis=-1
    )  # (B, N, 9)

    def scan_body(carry, tile):
        q_tile, lo = tile
        if window is None:
            cand, mom_c, z_c = pts, moments, z
        else:
            cand = jax.lax.dynamic_slice_in_dim(pts, lo, win_n, axis=1)
            mom_c = jax.lax.dynamic_slice_in_dim(moments, lo, win_n, axis=1)
            z_c = jax.lax.dynamic_slice_in_dim(z, lo, win_n, axis=1)
        d = pairwise_sqdist(q_tile, cand)  # (B, blk, win_n)
        if exact:
            neg_d, idx = jax.lax.top_k(-d, k)
            kd = -neg_d
        else:
            # bf16 distance tile: the scan is HBM-bound (the tile is read
            # by the selection, the mask build, and the z extrema); half
            # the bytes, ~0.4% relative distance fuzz, count-normalized
            # statistics absorb the tie blur. The exact path stays f32.
            d = d.astype(jnp.bfloat16)
            kd, idx = jax.lax.approx_min_k(d, k, recall_target=recall_target)
        kth = kd[..., -1:]  # (B, blk, 1)
        # bf16 mask: values are exactly 0/1 (no rounding), halves the HBM
        # bytes of the (B, blk, N) buffer feeding the moment matmuls.
        mask = (d <= kth).astype(jnp.bfloat16)
        cnt = jnp.maximum(
            jnp.sum(mask.astype(jnp.float32), axis=-1), 1.0
        )  # (B, blk)
        sums = jnp.einsum(
            "bqn,bnm->bqm", mask, mom_c, preferred_element_type=jnp.float32
        )  # (B, blk, 9)
        cov, czz = _cov_from_moment_sums(sums, cnt)  # (B, blk, 3, 3)
        z_nb = jnp.where(mask > 0, z_c[:, None, :], -jnp.inf)
        z_max = jnp.max(z_nb, axis=-1)
        z_min = jnp.min(
            jnp.where(mask > 0, z_c[:, None, :], jnp.inf), axis=-1
        )
        r_k = jnp.sqrt(jnp.maximum(kth[..., 0].astype(jnp.float32), 0.0))
        feats = _features_from_stats(
            cov, z_max, z_min, czz, r_k, k, eps,
        )
        return carry, (
            feats, (idx + lo).astype(jnp.int32),
            kth[..., 0].astype(jnp.float32),
        )

    _, (feats, idx, kths) = jax.lax.scan(scan_body, None, (q_tiles, los))
    feats = feats.transpose(1, 0, 2, 3).reshape(b, n_pad, 10)[:, :n]
    idx = idx.transpose(1, 0, 2, 3).reshape(b, n_pad, k)[:, :n]
    if return_kth:
        kths = kths.transpose(1, 0, 2).reshape(b, n_pad)[:, :n]
        return feats, idx, kths
    return feats, idx


@partial(jax.jit, static_argnames=("k", "block"))
def eigen_features(
    points: jnp.ndarray,
    k: int = 20,
    *,
    eps: float = 1e-8,
    block: int = 1024,
) -> jnp.ndarray:
    """Gather-based exact-k feature computation (oracle / portable path).

    Args:
      points: (B, N, 3) xyz point clouds (normalized submaps).
      k: neighbourhood size, including the point itself.
      eps: degeneracy guard for divisions/logs.
      block: kNN tile size.

    Returns:
      (B, N, 10) float32 features in the order documented above.

    The model's hot path uses ``eigen_features_and_knn`` (masked-moment
    matmuls, no gather); this exact-k version is its correctness oracle and
    what offline 13-D ``.bin`` preparation uses.
    """
    pts = points.astype(jnp.float32)

    idx, sqd = knn_indices_and_dists(pts, pts, k, block=block, exact=True)
    nbrs = gather_neighbors(pts, idx)  # (B, N, k, 3)

    mean = jnp.mean(nbrs, axis=2, keepdims=True)
    centered = nbrs - mean  # (B, N, k, 3)
    cov = jnp.einsum(
        "bnki,bnkj->bnij", centered, centered, preferred_element_type=jnp.float32
    ) / float(k)

    z = nbrs[..., 2]
    z_max = jnp.max(z, axis=-1)
    z_min = jnp.min(z, axis=-1)
    var_z = jnp.var(z, axis=-1)
    r_k = jnp.sqrt(jnp.maximum(sqd[..., -1], 0.0))
    return _features_from_stats(cov, z_max, z_min, var_z, r_k, k, eps)


@partial(jax.jit, static_argnames=("k", "block"))
def attach_features(
    points: jnp.ndarray, k: int = 20, *, eps: float = 1e-8, block: int = 1024
) -> jnp.ndarray:
    """xyz -> 13-D LPD input: concat(points, eigen_features(points)).

    Matches the reference's feature-augmented ``(4096, 13)`` submap layout
    (SURVEY C3/C4) so models can consume either precomputed 13-D files or
    raw xyz with on-device features.
    """
    feats = eigen_features(points, k, eps=eps, block=block)
    return jnp.concatenate([points.astype(jnp.float32), feats], axis=-1)
