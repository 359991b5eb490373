"""Functional NetVLAD ("Loupe") aggregation core.

The reference's ``NetVLADLoupe`` (reference: ``models/PointNetVlad.py`` —
SURVEY C12) soft-assigns N per-point features to K clusters and aggregates
residuals against learned centers. The whole pipeline is matmul + softmax +
matmul — exactly what XLA fuses well on the MXU — so the core is expressed
as einsums here; the Flax module owns the parameters (assignment weights,
centers, projection, gating).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def netvlad_partial(
    features: jnp.ndarray, assignment_logits: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The point-sum half of the aggregation: soft-assignment partials.

    Split here deliberately — these are the ONLY quantities NetVLAD reduces
    over the point axis, so a point-sharded forward (``parallel/sp.py``)
    computes them locally and ``psum``s before :func:`netvlad_finalize`.

    Returns ``(agg (B, K, D), a_sum (B, K))``.
    """
    logits = assignment_logits.astype(jnp.float32)
    a = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)  # softmax over K

    # agg[b,k,d] = sum_n a[b,n,k] * x[b,n,d]. The aggregation matmul
    # (contraction over N) runs on the features' dtype (bf16 on the fast
    # path) with fp32 accumulation.
    agg = jnp.einsum(
        "bnk,bnd->bkd",
        a.astype(features.dtype),
        features,
        preferred_element_type=jnp.float32,
    )
    return agg, jnp.sum(a, axis=1)


def netvlad_finalize(
    agg: jnp.ndarray,
    a_sum: jnp.ndarray,
    cluster_centers: jnp.ndarray,
    *,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Residuals vs centers + intra-/global L2 normalization (the
    point-count-free tail of the aggregation)."""
    vlad = agg - a_sum[..., None] * cluster_centers[None].astype(jnp.float32)
    # Intra-normalization: L2 over the feature axis per cluster.
    vlad = vlad / jnp.sqrt(
        jnp.sum(vlad * vlad, axis=-1, keepdims=True) + eps
    )
    b = vlad.shape[0]
    flat = vlad.reshape(b, -1)
    flat = flat / jnp.sqrt(jnp.sum(flat * flat, axis=-1, keepdims=True) + eps)
    return flat


def netvlad_aggregate(
    features: jnp.ndarray,
    assignment_logits: jnp.ndarray,
    cluster_centers: jnp.ndarray,
    *,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Soft-assignment residual aggregation.

    Args:
      features: (B, N, D) per-point features.
      assignment_logits: (B, N, K) unnormalized cluster logits (the module
        computes these as features @ W (+ BN or bias)).
      cluster_centers: (K, D) learned cluster centers (the reference's
        ``cluster_weights2``, stored transposed there).
      eps: normalization guard.

    Returns:
      (B, K*D) intra-normalized, L2-normalized VLAD descriptor (before the
      output projection).
    """
    agg, a_sum = netvlad_partial(features, assignment_logits)
    return netvlad_finalize(agg, a_sum, cluster_centers, eps=eps)
