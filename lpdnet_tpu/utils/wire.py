"""Reduced-precision host->device wire formats for point-cloud uploads.

Every sweep in this framework (eval descriptor extraction, the mining cache
refresh, serving, the per-step training tuples) is transfer-bound on
tunneled/low-DMA hosts, so the batches ship in a compact wire format and
the device casts back to float32 BEFORE any compute (reference uploads f32
tensors per iteration — SURVEY §3.1 host->device boundary).

Formats:
  * ``float32`` — identity.
  * ``float16`` — half the bytes; ~6e-4 quantization on [-1, 1] coords.
  * ``int16``  — half the bytes AND ~20x less quantization than float16:
    fixed-point at scale 2**14 covers [-2, 2) with a max rounding error of
    ~3.1e-5, below the bf16 distance fuzz the compute path already accepts
    (PERF_LOG round-1 fidelity audit).
  * ``int8``   — a QUARTER of the bytes (12 KB per 4096-pt submap):
    fixed-point at scale 2**6, max rounding error ~7.8e-3. Too coarse for
    the training wire (it would exceed the jitter sigma 5e-3), but
    measured retrieval-neutral for descriptor sweeps: full-scale flagship
    descriptor cosine >= 0.99999 vs the f32 upload (max-aggregation and
    count-normalized neighbourhood statistics absorb sub-percent
    coordinate noise — PERF_LOG round 3). The eval/mining/serving default.

Submaps are normalized to roughly [-1, 1] (SURVEY §0), so the [-2, 2)
range is ample; batches that do exceed it fall back to float16 (with a
one-time warning) instead of clipping silently.

Host side encodes with :func:`encode_points`; the jitted consumers decode
with :func:`decode_points` (dtype dispatch is static under trace, so each
wire format is simply its own compiled specialization).
"""

from __future__ import annotations

import numpy as np

INT16_SCALE = 2.0**14  # covers [-2, 2) at ~3.1e-5 max rounding error
INT8_SCALE = 2.0**6  # covers [-2, 2) at ~7.8e-3 max rounding error
_RANGE_LIMIT = 1.9999
_warned_range = False


def _encode_fixed_point(
    pts: np.ndarray, scale: float, dtype, lo: int, hi: int
) -> np.ndarray:
    amax = float(np.max(np.abs(pts))) if pts.size else 0.0
    if amax > _RANGE_LIMIT:
        global _warned_range
        if not _warned_range:
            _warned_range = True
            import warnings

            warnings.warn(
                f"fixed-point wire: coordinates reach |x|={amax:.3g} > "
                f"{_RANGE_LIMIT} (are the submaps normalized?); "
                "falling back to float16 for out-of-range batches",
                stacklevel=3,
            )
        return pts.astype(np.float16)
    return np.clip(np.round(pts * scale), lo, hi).astype(dtype)


def encode_points(pts: np.ndarray, transfer_dtype: str) -> np.ndarray:
    """Encode a host batch of points for upload (any leading shape)."""
    if transfer_dtype == "int16":
        return _encode_fixed_point(
            pts, INT16_SCALE, np.int16, -32768, 32767
        )
    if transfer_dtype == "int8":
        return _encode_fixed_point(pts, INT8_SCALE, np.int8, -128, 127)
    wire = np.dtype(transfer_dtype)
    return pts if pts.dtype == wire else pts.astype(wire)


def decode_points(points):
    """Device-side decode to float32 (jit-traceable; dtype is static)."""
    import jax.numpy as jnp

    if points.dtype == jnp.int8:
        return points.astype(jnp.float32) * jnp.float32(1.0 / INT8_SCALE)
    if jnp.issubdtype(points.dtype, jnp.integer):
        return points.astype(jnp.float32) * jnp.float32(1.0 / INT16_SCALE)
    return points.astype(jnp.float32)
