"""Squared pairwise distances as a single MXU matmul.

The reference builds its kNN graph from ``-2 x^T y + |x|^2 + |y|^2`` pairwise
matmuls (reference: ``models`` ``knn()`` — SURVEY C11); this is already the
right decomposition for the TPU MXU, so we keep it: one (Nq, C) @ (C, Nd)
matmul plus rank-1 norm corrections that XLA fuses into the epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances between two point sets.

    Args:
      x: (..., Nq, C) query points.
      y: (..., Nd, C) database points (same leading batch dims as ``x``).

    Returns:
      (..., Nq, Nd) squared distances, clamped to >= 0 (the matmul
      decomposition can go slightly negative in floating point).
    """
    # The cross-term matmul runs on the input dtype (bf16 inputs hit the
    # MXU at double rate) with fp32 accumulation; norms and the combine are
    # always fp32.
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    x2 = jnp.sum(xf * xf, axis=-1, keepdims=True)  # (..., Nq, 1)
    y2 = jnp.sum(yf * yf, axis=-1, keepdims=True)  # (..., Nd, 1)
    cross = jnp.einsum(
        "...qc,...dc->...qd", x, y, preferred_element_type=jnp.float32
    )
    d = x2 - 2.0 * cross + jnp.swapaxes(y2, -1, -2)
    return jnp.maximum(d, 0.0)
