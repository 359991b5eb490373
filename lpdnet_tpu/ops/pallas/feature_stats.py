"""Fused neighbourhood-statistics Pallas kernel for the feature stage.

Phase split of ``eigen_features_and_knn`` on TPU: an XLA scan computes the
kNN indices + k-th distances (``approx_min_k`` is a custom call and cannot
fuse), then THIS kernel recomputes each distance tile **in VMEM** (one
small MXU matmul per tile — FLOPs are free, HBM is not), masks it against
the k-th distance, and produces the moment sums / count / z extrema in one
pass. The (B, tile, N) distance and mask tiles never reach HBM — in the
pure-XLA path they are materialized and re-read by every consumer.

The moment matrix carries a ones column so the neighbour count falls out of
the same matmul: columns = [x, y, z, x^2, y^2, z^2, xy, xz, yz, 1, 0...].

Oracle: the masked-moment XLA path in
``lpdnet_tpu.ops.features.eigen_features_and_knn`` (tested in
``tests/test_pallas_feature_stats.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MOMENT_COLS = 16  # 9 moments + count + lane padding


def _stats_kernel(q_ref, ptsT_ref, moments_ref, kth_ref,
                  sums_ref, zmax_ref, zmin_ref):
    # q_ref:       (1, TILE, 3) f32
    # ptsT_ref:    (1, 3, N) f32   (row 2 = z)
    # moments_ref: (1, N, 16) f32
    # kth_ref:     (1, TILE, 1) f32 (squared k-th neighbour distance)
    # sums_ref:    (1, TILE, 16) f32
    # zmax/zmin:   (1, TILE, 1) f32
    q = q_ref[0]  # (TILE, 3)
    ptsT = ptsT_ref[0]  # (3, N)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # (TILE, 1)
    p2 = jnp.sum(ptsT * ptsT, axis=0, keepdims=True)  # (1, N)
    cross = jnp.dot(q, ptsT, preferred_element_type=jnp.float32)
    d = q2 - 2.0 * cross + p2  # (TILE, N)

    mask = (d <= kth_ref[0]).astype(jnp.float32)
    sums_ref[0] = jnp.dot(
        mask, moments_ref[0], preferred_element_type=jnp.float32
    )
    z = ptsT[2:3]  # (1, N)
    zmax_ref[0] = jnp.max(
        jnp.where(mask > 0, z, -jnp.inf), axis=1, keepdims=True
    )
    zmin_ref[0] = jnp.min(
        jnp.where(mask > 0, z, jnp.inf), axis=1, keepdims=True
    )


@partial(jax.jit, static_argnames=("tile", "interpret"))
def neighborhood_stats(
    points: jnp.ndarray,
    kth_sq: jnp.ndarray,
    *,
    tile: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked neighbourhood moment sums + z extrema, distances in VMEM.

    Args:
      points: (B, N, 3) float32 xyz.
      kth_sq: (B, N) squared distance to the k-th neighbour per point.
      tile: query rows per kernel step (VMEM distance tile is tile x N f32).

    Returns:
      (sums (B, N, 16), z_max (B, N), z_min (B, N)) — sums columns are
      [Sx, Sy, Sz, Sxx, Syy, Szz, Sxy, Sxz, Syz, count, 0...].
    """
    pts = points.astype(jnp.float32)
    b, n, _ = pts.shape
    if n % tile != 0:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")

    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    moments = jnp.stack(
        [x, y, z, x * x, y * y, z * z, x * y, x * z, y * z, ones]
        + [zeros] * (MOMENT_COLS - 10),
        axis=-1,
    )  # (B, N, 16)
    ptsT = jnp.swapaxes(pts, 1, 2)  # (B, 3, N)
    kth = kth_sq.astype(jnp.float32)[..., None]  # (B, N, 1)

    grid = (b, n // tile)
    sums, zmax, zmin = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, MOMENT_COLS), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, MOMENT_COLS), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, MOMENT_COLS), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(pts, ptsT, moments, kth)
    return sums, zmax[..., 0], zmin[..., 0]
