"""Neighbor feature gathering for graph ops."""

from __future__ import annotations

import jax.numpy as jnp


def gather_neighbors(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbour features.

    Args:
      features: (B, N, C) per-point features.
      idx: (B, M, k) int32 neighbour indices into the N axis.

    Returns:
      (B, M, k, C) gathered features: out[b, m, j] = features[b, idx[b, m, j]].
    """
    b, m, k = idx.shape
    c = features.shape[-1]
    flat = jnp.take_along_axis(
        features, idx.reshape(b, m * k, 1), axis=1
    )
    return flat.reshape(b, m, k, c)
