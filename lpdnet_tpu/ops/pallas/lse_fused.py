"""Fully-fused Pallas kernel for the gather-free LSE aggregation.

The XLA scan in ``ops/lse.py`` (the LPD trunk's default aggregation since
round 4) round-trips every block's intermediates through HBM as separate
ops: the (B, block, win) distance tile feeds an ``approx_min_k`` custom
call (which cannot fuse), the mask is re-materialized from the tile, and
each anchor level's (win, C) exp tensor is written and re-read by its
einsum.  Round-4 profiling attributes 29% of flagship inference to this
scan (docs/PERF_LOG.md) with most of it HBM-bound, not MXU-bound.

THIS kernel runs the whole scan body for one (batch, query-tile) pair in
VMEM — one trip in (points + values), one trip out (aggregated tile):

  1. distance tile  d = |q|^2 - 2 q . cand^T + |cand|^2      (MXU)
  2. k-th-distance threshold per row:
       * reuse the caller's (the feature stage already scanned xyz), or
       * an in-kernel **bitwise binary search over bf16 space**: positive
         bf16 floats ordered as their uint16 encodings, so 15 predicated
         count passes (``sum(d <= tau) >= k``) over the VMEM-resident tile
         find the EXACT k-th smallest bf16 distance — no ``approx_min_k``
         custom call, no recall_target approximation, ties kept (the mask
         semantics of ops/lse.py).
  3. mask = d <= kth, union anchor, multi-level exps           (VPU)
  4. level sums = mask @ exp-tile                              (MXU)
  5. log-combine + optional tie correction + self-value floor  (VPU)

Numerics notes vs ops/lse.py (oracle-tested in tests/test_lse_fused.py):

- Distances are computed in f32 and rounded to bf16 before thresholding,
  the same value space as the scan path's ``dist_dtype='bfloat16'``
  default; the threshold search is EXACT in that space (the scan path's
  ``approx_min_k`` at recall_target 0.85 is not), so the fused mask is a
  fidelity upgrade, not an approximation swap.
- The anchor is the union-of-masked-candidates max over THIS query tile
  (the scan path unions over its whole block).  Any per-(tile, channel)
  upper bound of the masked candidates is a valid anchor — the result is
  anchor-independent up to fp rounding — so outputs agree to ~1e-6.
- The multi-level branch split, deep-clamp fallback, tie correction and
  self-value floor are the scan path's, term for term.

Backward: ``lse_aggregate_fused`` is a ``jax.custom_vjp`` whose bwd
re-runs the XLA composite (``ops.lse.knn_lse_aggregate``) under
``jax.vjp`` with the kernel's own k-th distances passed back in, so the
backward mask matches the forward's up to the documented 2-ulp reuse
inflation (ops/lse.py ``kth`` doc) and gradients stay the proven
matmul-scatter form.  Gradients w.r.t. the metric ``space`` are zero by
construction in BOTH paths (mask and anchor are stop-grad).

Reference: SURVEY C11 (EdgeConv max aggregation); this is a TPU-native
redesign, no reference analogue exists.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lpdnet_tpu.ops.lse import _SHIFT, knn_lse_aggregate

# bf16 +inf bit pattern (as the uint16 encoding): exponent all-ones,
# mantissa zero. The binary search runs over [0, _BF16_INF_BITS], which
# covers every non-negative finite bf16 (squared distances are >= 0).
_BF16_INF_BITS = 0x7F80
# lower_bound over 0x7F81 candidate encodings needs ceil(log2) passes.
_SEARCH_ITERS = int(math.ceil(math.log2(_BF16_INF_BITS + 1)))  # 15


def _bits_to_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """bf16 uint16 encoding (held in int32) -> the exact f32 value."""
    return jax.lax.bitcast_convert_type(
        jax.lax.shift_left(bits, 16), jnp.float32
    )


def _lse_kernel_body(
    q_ref, spaceT_ref, values_ref, t_ref, kth_in_ref,
    out_ref, kth_out_ref,
    *, k, tile, win_n, window, n, levels, tie_correction, use_kth,
):
    # q_ref:      (1, tile, Cs) f32 — this tile's query points
    # spaceT_ref: (1, Cs, N) f32    — all candidate points, transposed
    # values_ref: (1, N, C) f32     — all candidate values
    # t_ref:      (1, 1, C) f32     — per-channel temperature t0/std
    # kth_in_ref: (1, tile, 1) f32  — caller threshold (use_kth only)
    # out_ref:    (1, tile, C) f32
    # kth_out_ref:(1, tile, 1) f32  — the mask threshold actually used
    ti = pl.program_id(1)
    q0 = ti * tile
    if window is None:
        lo = 0
    else:
        g = math.gcd(math.gcd(tile, window), n - win_n)
        lo = jnp.clip(q0 - window, 0, n - win_n)
        lo = pl.multiple_of(lo, g)

    q = q_ref[0]  # (tile, Cs)
    candT = spaceT_ref[0, :, pl.ds(lo, win_n)]  # (Cs, win)
    vals_w = values_ref[0, pl.ds(lo, win_n), :]  # (win, C)
    v_self = values_ref[0, pl.ds(q0, tile), :]  # (tile, C)

    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # (tile, 1)
    c2 = jnp.sum(candT * candT, axis=0, keepdims=True)  # (1, win)
    cross = jnp.dot(q, candT, preferred_element_type=jnp.float32)
    d = jnp.maximum(q2 - 2.0 * cross + c2, 0.0)  # (tile, win) f32
    # Round to the scan path's bf16 mask space: thresholds are then
    # bf16-representable and the in-kernel search is exact.
    d = d.astype(jnp.bfloat16).astype(jnp.float32)

    if use_kth:
        kth = kth_in_ref[0]  # (tile, 1), pre-inflated by the wrapper
    else:
        # Bitwise lower_bound over bf16 encodings: smallest tau with
        # count(d <= tau) >= k. Non-negative bf16 floats are ordered as
        # their uint16 encodings, so 15 predicated count passes over the
        # VMEM-resident tile find the exact (tie-inclusive) k-th distance.
        lo_bits = jnp.zeros((tile, 1), jnp.int32)
        hi_bits = jnp.full((tile, 1), _BF16_INF_BITS, jnp.int32)
        for _ in range(_SEARCH_ITERS):
            mid = (lo_bits + hi_bits) // 2
            tau = _bits_to_f32(mid)
            count = jnp.sum(
                (d <= tau).astype(jnp.float32), axis=1, keepdims=True
            )
            ge = count >= float(k)
            hi_bits = jnp.where(ge, mid, hi_bits)
            lo_bits = jnp.where(ge, lo_bits, mid + 1)
        kth = _bits_to_f32(hi_bits)  # (tile, 1)
    kth_out_ref[0] = kth

    m_bool = d <= kth  # (tile, win)
    mask_f = m_bool.astype(jnp.float32)
    mask = m_bool.astype(jnp.bfloat16)

    # Union anchor over the tile's masked candidates (ops/lse.py: any
    # valid per-(tile, channel) upper bound works; the self-match keeps
    # every union non-empty).
    any_q = jnp.max(mask_f, axis=0)[:, None]  # (win, 1)
    anchor = jnp.max(
        jnp.where(any_q > 0.0, vals_w, -jnp.inf), axis=0, keepdims=True
    )  # (1, C)

    t = t_ref[0]  # (1, C)
    z = t * (vals_w - anchor)  # (win, C), <= 0 on masked candidates
    tiny = float(np.finfo(np.float32).tiny)
    sums = []
    for l in range(levels):
        z_l = z + l * _SHIFT
        e_l = jnp.exp(jnp.where(z_l > 0.0, 0.0, z_l)).astype(jnp.bfloat16)
        sums.append(
            jnp.dot(mask, e_l, preferred_element_type=jnp.float32)
        )  # (tile, C)
    log_s = (
        jnp.log(jnp.maximum(sums[-1], tiny)) - (levels - 1) * _SHIFT
    )
    for l in range(levels - 2, -1, -1):
        log_s = jnp.where(
            sums[l] >= float(np.exp(-_SHIFT)),
            jnp.log(jnp.maximum(sums[l], tiny)) - l * _SHIFT,
            log_s,
        )
    if tie_correction:
        m_rows = jnp.sum(mask_f, axis=1, keepdims=True)  # (tile, 1)
        log_s = log_s - jnp.log(jnp.maximum(m_rows / float(k), 1.0))
    out = anchor + log_s / t
    out_ref[0] = jnp.maximum(out, v_self)


def _fused_call(
    space, values, t, kth_in, *, k, tile, window, levels, tie_correction,
    interpret,
):
    b, n, cs = space.shape
    c = values.shape[-1]
    win_n = n if window is None else min(tile + 2 * window, n)
    window_ = None if (window is None or win_n >= n) else window
    if window_ is None:
        win_n = n
    use_kth = kth_in is not None
    kern = partial(
        _lse_kernel_body, k=k, tile=tile, win_n=win_n, window=window_,
        n=n, levels=levels, tie_correction=tie_correction, use_kth=use_kth,
    )
    spaceT = jnp.swapaxes(space, 1, 2)  # (B, Cs, N)
    in_specs = [
        pl.BlockSpec((1, tile, cs), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cs, n), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [space, spaceT, values, t,
            kth_in if use_kth
            else jnp.zeros((b, n, 1), jnp.float32)]
    out, kth_out = pl.pallas_call(
        kern,
        grid=(b, n // tile),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return out, kth_out


def fused_lse_supported(
    *, n: int, tile: int, window: Optional[int], exclude_self: bool,
    exact: bool, dist_dtype: str,
) -> bool:
    """Static gate: shapes/modes this kernel covers (callers fall back to
    the XLA scan otherwise — the fused path is a perf feature of the
    DEFAULT stack, not a second semantics)."""
    if exclude_self or exact or dist_dtype != "bfloat16":
        return False
    if n % tile or tile % 8:
        return False
    if window is not None:
        win_n = min(tile + 2 * window, n)
        if win_n < n:
            g = math.gcd(math.gcd(tile, window), n - win_n)
            if g % 8:
                return False
    return True


@partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
)
def _fused_lse(
    space, values, kth_in, k, t0, tile, window, levels, tie_correction,
    interpret, std,
):
    out, _ = _fused_fwd(
        space, values, kth_in, k, t0, tile, window, levels, tie_correction,
        interpret, std,
    )
    return out


def _temperature(values, std, t0):
    vals = values.astype(jnp.float32)
    if std is None:
        std = jnp.std(vals, axis=1, keepdims=True)
    return jax.lax.stop_gradient(
        float(t0) / jnp.maximum(std.astype(jnp.float32), 1e-6)
    )


def _fused_fwd(
    space, values, kth_in, k, t0, tile, window, levels, tie_correction,
    interpret, std,
):
    sp = space.astype(jnp.float32)
    vals = values.astype(jnp.float32)
    t = _temperature(values, std, t0)
    if kth_in is not None:
        # Reused threshold from another scan over the same metric space:
        # inflate by 2 bf16 ulps exactly like ops/lse.py's approx-path
        # reuse (the two programs' bf16 distance tiles can round ~1 ulp
        # apart; the inflation makes the mask a near-superset instead of
        # dropping boundary neighbours).
        kern_kth = (
            jax.lax.stop_gradient(kth_in.astype(jnp.float32))
            * (1.0 + 2.0 ** -6)
        )[..., None]
    else:
        kern_kth = None
    out, kth = _fused_call(
        sp, vals, t, kern_kth, k=k, tile=tile, window=window, levels=levels,
        tie_correction=tie_correction, interpret=interpret,
    )
    # The bwd composite re-inflates an approx-path threshold itself, so
    # hand it the ORIGINAL reused threshold (same final mask value as the
    # fwd's) — or the kernel's own exact search result otherwise.
    kth_bwd = (
        jax.lax.stop_gradient(kth_in) if kth_in is not None else kth[..., 0]
    )
    return out.astype(values.dtype), (space, values, std, kth_bwd, kth_in)


def _fused_bwd(
    k, t0, tile, window, levels, tie_correction, interpret, res, dout,
):
    space, values, std, kth, kth_in = res
    # The XLA composite with the kernel's own thresholds: its 2-ulp reuse
    # inflation makes the bwd mask a near-superset of the fwd's (boundary
    # ties only — the same approximation class as the scan path's own
    # kth-reuse, ops/lse.py). Gradients to ``space`` are zero in both
    # paths (mask/anchor are stop-grad), matching autodiff here.
    def f(v, s):
        return knn_lse_aggregate(
            space, v, k, t0=t0, block=tile, window=window,
            dist_dtype="bfloat16", std=s, levels=levels,
            tie_correction=tie_correction, kth=kth,
        )
    if std is None:
        _, vjp = jax.vjp(lambda v: f(v, None), values)
        (dvalues,) = vjp(dout)
        dstd = None
    else:
        _, vjp = jax.vjp(f, values, std)
        dvalues, dstd = vjp(dout)
    dkth = None if kth_in is None else jnp.zeros_like(kth_in)
    return jnp.zeros_like(space), dvalues, dkth, dstd


_fused_lse.defvjp(_fused_fwd, _fused_bwd)


def lse_aggregate_fused(
    space: jnp.ndarray,
    values: jnp.ndarray,
    k: int,
    *,
    t0: float = 24.0,
    tile: int = 256,
    window: Optional[int] = None,
    levels: int = 2,
    tie_correction: bool = False,
    std: Optional[jnp.ndarray] = None,
    kth: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-kernel twin of ``ops.lse.knn_lse_aggregate`` (bf16 mask space,
    ``exclude_self=False``). ``tile`` plays the scan path's ``block`` role
    (query rows per kernel step; the candidate window is ``tile + 2 *
    window`` sorted rows). The k-th-distance threshold is found EXACTLY
    in bf16 space by an in-kernel bitwise binary search — no
    ``approx_min_k`` call, no recall_target — unless ``kth`` (B, N)
    hands in another scan's threshold over the same metric space, which
    skips the search (2-bf16-ulp inflated, ops/lse.py reuse semantics)."""
    b, n, _ = space.shape
    c = values.shape[-1]
    if values.shape[:2] != (b, n):
        raise ValueError(
            f"space {space.shape} / values {values.shape} disagree on (B, N)"
        )
    if std is not None and std.shape != (b, 1, c):
        raise ValueError(f"std shape {std.shape} != {(b, 1, c)}")
    if kth is not None and kth.shape != (b, n):
        raise ValueError(
            f"kth shape {kth.shape} != {(b, n)} (per-row threshold)"
        )
    win_n = n if window is None else min(tile + 2 * window, n)
    if k > win_n:
        # Mirror ops/lse.py's loud failure: with k beyond the candidate
        # window the in-kernel lower-bound search never reaches count>=k
        # and would silently return kth=+inf (a smooth max over the whole
        # window) instead of a k-neighbour aggregation.
        raise ValueError(
            f"k={k} too large for the candidate window "
            f"(tile + 2*window = {win_n}); widen window or tile"
        )
    if not fused_lse_supported(
        n=n, tile=tile, window=window, exclude_self=False, exact=False,
        dist_dtype="bfloat16",
    ):
        raise ValueError(
            f"unsupported fused-LSE shape (n={n}, tile={tile}, "
            f"window={window}); use ops.lse.knn_lse_aggregate"
        )
    return _fused_lse(
        space, values, kth, k, float(t0), tile, window, levels,
        bool(tie_correction), interpret, std,
    )
