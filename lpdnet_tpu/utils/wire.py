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
range is ample. Out-of-range batches are handled two ways:

  * default — fall back to float16 (with a one-time warning) instead of
    clipping silently. The per-format limit is where ``round`` would leave
    the integer range (int8: ~1.992, int16: ~1.99997), so the documented
    max rounding error holds for every batch that stays fixed-point.
  * ``strict=True`` — keep the requested dtype and CLIP (one-time
    warning). Multi-process sweeps need this: the wire dtype is baked into
    the shared SPMD program, so a data-dependent per-process fallback
    would hand ``make_array_from_process_local_data`` mismatched local
    dtypes across the fleet.

Host side encodes with :func:`encode_points` (dicts of tuple components
with :func:`encode_batch`, which makes ONE dtype decision for all
components — a per-component fallback would concatenate mixed dtypes in
``_flatten_tuples`` and decode incorrectly); the jitted consumers decode
with :func:`decode_points` (dtype dispatch is static under trace, so each
wire format is simply its own compiled specialization).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

INT16_SCALE = 2.0**14  # covers [-2, 2) at ~3.1e-5 max rounding error
INT8_SCALE = 2.0**6  # covers [-2, 2) at ~7.8e-3 max rounding error
_FORMATS = {
    "int16": (INT16_SCALE, np.int16, -32768, 32767),
    "int8": (INT8_SCALE, np.int8, -128, 127),
}
_warned_range = False
_warned_clip = False


def _safe_limit(scale: float, hi: int) -> float:
    # Largest |x| for which round(x * scale) is guaranteed <= hi (0.49
    # keeps a margin from round-half-to-even at exactly hi + 0.5).
    return (hi + 0.49) / scale


def _amax(pts: np.ndarray) -> float:
    return float(np.max(np.abs(pts))) if pts.size else 0.0


def _warn_fallback(amax: float, limit: float) -> None:
    global _warned_range
    if not _warned_range:
        _warned_range = True
        import warnings

        warnings.warn(
            f"fixed-point wire: coordinates reach |x|={amax:.3g} > "
            f"{limit:.4g} (are the submaps normalized?); "
            "falling back to float16 for out-of-range batches",
            stacklevel=4,
        )


def _warn_clip(amax: float, limit: float) -> None:
    global _warned_clip
    if not _warned_clip:
        _warned_clip = True
        import warnings

        warnings.warn(
            f"fixed-point wire (strict): coordinates reach |x|={amax:.3g} "
            f"> {limit:.4g} (are the submaps normalized?); clipping to "
            "range (the multi-process wire dtype cannot vary per batch)",
            stacklevel=4,
        )


def _encode_fixed_point(
    pts: np.ndarray, scale: float, dtype, lo: int, hi: int,
    strict: bool = False,
) -> np.ndarray:
    limit = _safe_limit(scale, hi)
    amax = _amax(pts)
    if amax > limit:
        if strict:
            _warn_clip(amax, limit)
        else:
            _warn_fallback(amax, limit)
            return pts.astype(np.float16)
    return np.clip(np.round(pts * scale), lo, hi).astype(dtype)


def encode_points(
    pts: np.ndarray, transfer_dtype: str, strict: bool = False
) -> np.ndarray:
    """Encode a host batch of points for upload (any leading shape).
    ``strict``: never change the wire dtype on out-of-range data — clip
    instead (required for multi-process sweeps; see module docstring)."""
    fmt = _FORMATS.get(transfer_dtype)
    if fmt is not None:
        return _encode_fixed_point(pts, *fmt, strict=strict)
    wire = np.dtype(transfer_dtype)
    return pts if pts.dtype == wire else pts.astype(wire)


def encode_batch(
    batch: Dict[str, np.ndarray], transfer_dtype: str
) -> Dict[str, np.ndarray]:
    """Encode a dict of tuple components with ONE wire-dtype decision made
    across ALL components: if any component is out of fixed-point range,
    every component falls back to float16 together, so the concatenated
    tuple stays a single dtype and decodes with a single scale."""
    fmt = _FORMATS.get(transfer_dtype)
    if fmt is not None:
        scale, _, _, hi = fmt
        limit = _safe_limit(scale, hi)
        amax = max((_amax(v) for v in batch.values()), default=0.0)
        if amax > limit:
            _warn_fallback(amax, limit)
            transfer_dtype = "float16"
    return {k: encode_points(v, transfer_dtype) for k, v in batch.items()}


def decode_points(points):
    """Device-side decode to float32 (jit-traceable; dtype is static)."""
    import jax.numpy as jnp

    if points.dtype == jnp.int8:
        return points.astype(jnp.float32) * jnp.float32(1.0 / INT8_SCALE)
    if jnp.issubdtype(points.dtype, jnp.integer):
        return points.astype(jnp.float32) * jnp.float32(1.0 / INT16_SCALE)
    return points.astype(jnp.float32)
