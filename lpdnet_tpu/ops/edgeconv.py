"""DGCNN-style edge features for graph aggregation.

The reference's ``get_graph_feature`` builds ``[x_j - x_i, x_i]`` edge
tensors and max-pools over neighbours after a shared conv (reference:
``models`` LPD feature net — SURVEY C11). Here the gather + concat is a
separate functional op; the shared MLP + max live in the Flax module so XLA
can fuse the conv into the reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

from lpdnet_tpu.ops.gather import gather_neighbors


def edge_features(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Build per-edge features ``[x_j - x_i, x_i]``.

    Args:
      features: (B, N, C) per-point features.
      idx: (B, N, k) neighbour indices.

    Returns:
      (B, N, k, 2C): concat of (neighbour - center) and center (broadcast
      over k), the DGCNN edge feature.
    """
    nbrs = gather_neighbors(features, idx)  # (B, N, k, C)
    center = features[:, :, None, :]
    return jnp.concatenate(
        [nbrs - center, jnp.broadcast_to(center, nbrs.shape)], axis=-1
    )
