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

import jax
import jax.numpy as jnp

from lpdnet_tpu.ops.eigen import (
    eigvals_sym2x2,
    eigvals_sym3x3,
    smallest_eigvec_sym3x3,
)
from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.knn import knn_indices_and_dists

_FOUR_THIRDS_PI = 4.1887902047863905


@partial(jax.jit, static_argnames=("k", "block"))
def eigen_features(
    points: jnp.ndarray,
    k: int = 20,
    *,
    eps: float = 1e-8,
    block: int = 1024,
) -> jnp.ndarray:
    """Compute the 10 handcrafted local features for every point.

    Args:
      points: (B, N, 3) xyz point clouds (normalized submaps).
      k: neighbourhood size, including the point itself.
      eps: degeneracy guard for divisions/logs.
      block: kNN tile size.

    Returns:
      (B, N, 10) float32 features in the order documented above.
    """
    pts = points.astype(jnp.float32)
    b, n, _ = pts.shape

    idx, sqd = knn_indices_and_dists(pts, pts, k, block=block)
    nbrs = gather_neighbors(pts, idx)  # (B, N, k, 3)

    mean = jnp.mean(nbrs, axis=2, keepdims=True)
    centered = nbrs - mean  # (B, N, k, 3)
    cov = jnp.einsum(
        "bnki,bnkj->bnij", centered, centered, preferred_element_type=jnp.float32
    ) / float(k)

    lam = eigvals_sym3x3(cov)  # (B, N, 3) descending
    lam = jnp.maximum(lam, 0.0)
    lam_sum = jnp.sum(lam, axis=-1)
    safe_sum = jnp.maximum(lam_sum, eps)
    l1, l2, l3 = lam[..., 0], lam[..., 1], lam[..., 2]

    curvature_change = l3 / safe_sum
    omnivariance = jnp.cbrt(jnp.maximum(l1 * l2 * l3, 0.0))
    linearity = (l1 - l2) / jnp.maximum(l1, eps)
    e = lam / safe_sum[..., None]
    entropy = -jnp.sum(e * jnp.log(jnp.maximum(e, eps)), axis=-1)

    # 2-D features from the xy projection of the neighbourhood.
    cov2 = cov[..., :2, :2]
    lam2d = jnp.maximum(eigvals_sym2x2(cov2), 0.0)  # (B, N, 2) descending
    scattering_2d = lam2d[..., 0] + lam2d[..., 1]
    linearity_2d = lam2d[..., 1] / jnp.maximum(lam2d[..., 0], eps)

    z = nbrs[..., 2]
    delta_z = jnp.max(z, axis=-1) - jnp.min(z, axis=-1)
    std_z = jnp.std(z, axis=-1)

    # Local density: k points inside the sphere of radius r_k (distance to
    # the farthest of the k neighbours).
    r_k = jnp.sqrt(jnp.maximum(sqd[..., -1], 0.0))
    density = float(k) / (_FOUR_THIRDS_PI * jnp.maximum(r_k, eps) ** 3 + eps)

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
