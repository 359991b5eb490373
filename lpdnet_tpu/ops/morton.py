"""Morton (Z-order) spatial sort for point clouds.

Relabeling a submap's points by Morton code makes kNN neighbour indices
index-local: measured on synthetic submaps, the k=20 xyz-graph neighbours of
a point span ~5.8 distinct 16-row slabs after the sort vs ~19.3 before (and
~6.1 for the learned-feature-space graph, because trunk features are
spatially smooth). Two consumers: the windowed-kNN candidate scans
(``ops/knn.py`` / ``ops/features.py``, the production win) and the
slab-dedup gather kernel (``ops/pallas/edge_gather_dedup.py``, a kept
negative result).

The descriptor model is permutation-invariant (per-point feature stage, kNN
sets, symmetric max/sum pooling are all label-independent), so sorting is
semantically free; only approximate-selection tie-breaks can differ.

All ops are elementwise integer math (VPU) + one ``sort`` per cloud; no
reference counterpart (the reference never reorders points — this is a
TPU-layout optimization, SURVEY §7 "Design stance").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BITS = 10  # 30-bit codes: 10 bits per axis


def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between each of the low 10 bits (magic-number
    bit spread, the standard 3-D Morton interleave)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) xyz -> (..., N) int32 Morton codes (per-cloud normalized;
    the code only defines an order within each cloud, so per-cloud min/max
    normalization is exactly what's wanted)."""
    pts = points.astype(jnp.float32)
    lo = jnp.min(pts, axis=-2, keepdims=True)
    hi = jnp.max(pts, axis=-2, keepdims=True)
    u = (pts - lo) / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(
        (u * (1 << _BITS)).astype(jnp.int32), 0, (1 << _BITS) - 1
    )
    return (
        (_spread3(q[..., 0]) << 2)
        | (_spread3(q[..., 1]) << 1)
        | _spread3(q[..., 2])
    )


def morton_sort(points: jnp.ndarray) -> jnp.ndarray:
    """Sort each cloud's points by Morton code: (..., N, C) -> same shape.

    Keys come from the first three (xyz) channels; any further channels
    (e.g. precomputed 10-D features of the 13-D LPD input) ride along as
    payload. One ``lax.sort``, no gather.
    """
    codes = morton_codes(points[..., :3])
    pts = points.astype(jnp.float32)
    c = pts.shape[-1]
    sorted_ops = jax.lax.sort(
        (codes, *(pts[..., i] for i in range(c))),
        dimension=-1,
        num_keys=1,
    )
    return jnp.stack(sorted_ops[1:], axis=-1)
