"""Fused kNN max-aggregation as masked log-sum-exp matmuls (MXU path).

The LPD trunk's EdgeConv aggregation (reference: ``get_graph_feature`` +
max over neighbours — SURVEY C11) is ``out[i, c] = max_{j in knn(i)}
proj[j, c]``.  Every previous implementation here materialized the
neighbour set: select indices (``approx_min_k``) -> gather k rows -> max.
The gather is issue-bound at ~2.4 ns/edge (docs/PERF_LOG.md "gather
floor") and dominates both the forward (~58%) and the train step (~60%,
with its eq-mask scatter VJP).

This op removes the gather entirely with the same masked-matmul
philosophy the handcrafted-feature stage already uses
(``ops/features.py``: neighbourhood moments = ``mask @ moments``):

  max_j v_j  ~=  (1/t) * log( sum_j exp(t * v_j) )      (smooth max)

and the masked sum over neighbours IS a matmul on the distance mask:

  S[i, c] = sum_w mask[i, w] * exp(t * (v[w, c] - M[c]))
          = (mask @ E)[i, c]                             (MXU)

where ``mask[i, w] = (d[i, w] <= kth(i))`` falls out of the SAME distance
tile the kNN selection already scans, and the k-th-distance threshold is
the selection's own last value.  The backward of ``mask @ E`` is two more
matmuls (a softmax-weighted scatter), so plain autodiff replaces the
custom-VJP Pallas scatter kernel as well.

Numerics (all measured bounds in tests/test_lse.py):

- **Temperature** is per submap and per channel: ``t = t0 / std_c`` with
  ``std_c`` the channel's std over the submap's points (stop-gradient).
  The smooth-max bias is ``log(m)/t <= log(m) * std_c / t0`` for ``m``
  near-ties — scale-invariant in the values.
- **Anchor** is per scan block and per channel: ``M = max over the UNION
  of the block's masked candidates`` (stop-gradient), so exponents are
  <= 0 *on masked candidates* and the exp's underflow horizon (~88/t
  below the anchor in f32; the bf16 cast used for the matmul keeps ~ the
  same horizon since bf16 shares f32's exponent range) is relative to
  the values actually being aggregated by this block, not the global
  max.  **Multi-level anchoring** (``levels`` sums, level ``l``
  re-anchored ``l * _SHIFT`` exponent units lower, with an exact branch
  split — see the scan body) extends the horizon to
  ``~(87 + (levels-1) * _SHIFT)`` units = ``~6.3 * std_c`` at
  ``levels=2`` / ``~9 * std_c`` at ``levels=3`` for the default ``t0``.
  Rows whose entire neighbourhood still sits below that clamp; with
  ``exclude_self=False`` (the model default — the reference's graph
  keeps the self-match) the result is additionally floored at the row's
  own value, which bounds the clamp error by the neighbourhood's value
  spread.
- **Unmasked candidates can sit ABOVE the anchor** (the anchor covers the
  union of *masked* candidates only — a window/halo point nobody selects
  is outside it), so every level's exponent is clamped at 0 before the
  exp: without the clamp, ``exp(z) = inf`` on such an outlier turns the
  masked matmul into ``0 * inf = NaN``.  The clamp is exact for masked
  candidates (their ``z <= 0`` by construction).  This was a real
  failure: flagship-scale training NaN'd from step 1 (round-4 battery,
  docs/PERF_LOG.md) via exactly this path.
- The mask is exact 0/1 in bf16; the matmul accumulates in f32.

Threshold semantics vs the gather path: the mask keeps EVERY candidate
with ``d <= kth``, so distance ties at the k-th neighbour all aggregate
(the gather keeps an arbitrary k of them), and when ``approx_min_k``
overestimates the k-th distance the mask INCLUDES the true neighbours the
index list missed — mask neighbour recall is >= the index recall at the
same ``recall_target``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lpdnet_tpu.ops.pairwise import pairwise_sqdist


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Per-level anchor offset (in exponent units): level ``l`` carries values
# between ~(87 + (l-1)*_SHIFT) and ~(87 + l*_SHIFT) below the block
# anchor. 64 keeps each level comfortably inside f32/bf16 exp range while
# leaving the branch split's tail-miss error at ~e^-16 relative (see the
# scan body).
_SHIFT = 64.0


@partial(
    jax.jit,
    static_argnames=(
        "k", "t0", "block", "window", "exclude_self", "exact",
        "recall_target", "dist_dtype", "levels", "tie_correction",
    ),
)
def knn_lse_aggregate(
    space: jnp.ndarray,
    values: jnp.ndarray,
    k: int,
    *,
    t0: float = 24.0,
    block: int = 512,
    window: Optional[int] = None,
    exclude_self: bool = False,
    exact: bool = False,
    recall_target: float = 0.95,
    dist_dtype: str = "float32",
    std: Optional[jnp.ndarray] = None,
    levels: int = 2,
    kth: Optional[jnp.ndarray] = None,
    tie_correction: bool = False,
) -> jnp.ndarray:
    """Smooth ``max_{j in knn(i)} values[j]`` over a self-graph, gather-free.

    Args:
      space: (B, N, Cs) points defining the metric (xyz or learned features).
      values: (B, N, C) per-point values to max-aggregate over neighbours.
      k: neighbourhood size (the k-th smallest distance sets the mask).
      t0: dimensionless sharpness; the effective temperature is
        ``t0 / std_c`` per submap and channel. Larger = closer to the hard
        max (bias <= log(m)*std_c/t0) but a narrower contribution window
        (~88*std_c/t0 below each block anchor).
      block / window / exclude_self / exact / recall_target / dist_dtype:
        as in ``ops.knn.knn_indices_and_dists`` (the scan skeleton is the
        same; ``window`` requires Morton-sorted input).
      std: optional (B, 1, C) per-submap channel std overriding the
        internal ``jnp.std(values, axis=1)``. Point-parallel callers
        (parallel/sp.py) pass the GLOBAL std here — each shard sees only
        its local window rows, but the temperature must match the
        single-device model's whole-submap statistic.
      levels: number of anchor levels (>= 1). Each extra level is one
        more mask matmul per scan block and extends the underflow
        horizon by ``_SHIFT`` exponent units (``~_SHIFT * std_c / t0``
        in value space); rows whose whole neighbourhood sits below the
        last level's horizon clamp (bounded by the self-value floor).
      tie_correction: subtract the per-row tie-explosion bias
        ``log(max(m/k, 1)) / t`` where ``m`` is the row's mask count
        (``sum_w mask[i, w]``, free in the scan). The mask keeps EVERY
        candidate at ``d <= kth``, so on tie-degenerate geometry (a
        coplanar ground sheet: many candidates exactly at the k-th
        distance) ``m >> k`` and the smooth-max bias ``log(m)/t`` varies
        per ROW — measured descriptor cosine 0.64 vs 'max' on coplanar
        sheets (docs/PERF_LOG.md round 4). The correction renormalizes an
        exploded row to the ``log(k)/t``-class bias every ``m ~ k`` row
        already carries (for an all-tied row it yields exactly the
        ``k``-tie smooth max), and is a no-op when ``m <= k``. Stop-grad
        additive: gradients are untouched.
      kth: optional (B, N) per-row squared-distance mask threshold. When
        given, the selection (``approx_min_k`` / ``top_k``) is SKIPPED
        entirely and the mask is ``d <= kth`` — the caller reuses a
        threshold an earlier scan over the SAME metric space already
        computed (the feature stage's, ``ops/features.py
        eigen_features_and_knn(return_kth=True)``). On the approx path
        the threshold is inflated by 2 bf16 ulps before masking: the two
        programs' bf16 distance tiles can round differently, and the
        inflation turns boundary divergence into a near-superset mask
        (extra near-ties) instead of dropped true neighbours. Exact-f32
        thresholds are used as-is (bitwise match).

    Returns:
      (B, N, C) aggregated values, in ``values.dtype``.
    """
    b, n, _ = space.shape
    c = values.shape[-1]
    if values.shape[:2] != (b, n):
        raise ValueError(
            f"space {space.shape} and values {values.shape} disagree on (B, N)"
        )
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    if kth is not None and kth.shape != (b, n):
        raise ValueError(
            f"kth shape {kth.shape} != {(b, n)} (per-row threshold)"
        )
    sp = space.astype(jnp.float32)
    vals = values.astype(jnp.float32)

    # Per-submap, per-channel temperature (stop-grad: t is a numeric knob,
    # not a learnable path).
    if std is None:
        std = jnp.std(vals, axis=1, keepdims=True)  # (B, 1, C)
    elif std.shape != (b, 1, c):
        raise ValueError(
            f"std shape {std.shape} != {(b, 1, c)} (per-submap channel std)"
        )
    t = jax.lax.stop_gradient(
        float(t0) / jnp.maximum(std.astype(jnp.float32), 1e-6)
    )

    block = min(block, _round_up(n, 8))
    n_pad = _round_up(n, block)
    num_blocks = n_pad // block
    q_pad = jnp.pad(sp, ((0, 0), (0, n_pad - n), (0, 0)))
    q_tiles = q_pad.reshape(b, num_blocks, block, -1).transpose(1, 0, 2, 3)
    if kth is not None:
        # Padded rows get threshold -1: they mask nothing, so they cannot
        # join the anchor union (their outputs are sliced off anyway).
        kth_pad = jnp.pad(
            kth.astype(jnp.float32), ((0, 0), (0, n_pad - n)),
            constant_values=-1.0,
        )
        kth_tiles = kth_pad.reshape(b, num_blocks, block).transpose(1, 0, 2)
    if exclude_self:
        base = jax.lax.broadcasted_iota(jnp.int32, (num_blocks, block), 0) * block
        row_ids = base + jax.lax.broadcasted_iota(jnp.int32, (num_blocks, block), 1)
    else:
        row_ids = jnp.zeros((num_blocks, block), jnp.int32)

    win_n = n if window is None else min(block + 2 * window, n)
    if window is not None and win_n >= n:
        window = None
        win_n = n
    if window is not None and k > win_n - (1 if exclude_self else 0):
        raise ValueError(
            f"k={k} too large for the candidate window "
            f"(block + 2*window = {win_n}); widen window or block"
        )
    if window is not None:
        los = np.clip(
            np.arange(num_blocks) * block - window, 0, n - win_n
        ).astype(np.int32)
    else:
        los = np.zeros(num_blocks, np.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, win_n), 2)

    mm_dtype = jnp.float32 if exact else jnp.bfloat16
    tiny = float(np.finfo(np.float32).tiny)

    use_kth = kth is not None

    def scan_body(carry, tile):
        if use_kth:
            q_tile, rows, lo, kth_rows = tile
        else:
            q_tile, rows, lo = tile  # (B, block, Cs), (block,), ()
        cand = (
            sp if window is None
            else jax.lax.dynamic_slice_in_dim(sp, lo, win_n, axis=1)
        )
        vals_w = (
            vals if window is None
            else jax.lax.dynamic_slice_in_dim(vals, lo, win_n, axis=1)
        )
        d = pairwise_sqdist(q_tile, cand)  # (B, block, win_n)
        if exclude_self:
            d = jnp.where(col_ids + lo == rows[None, :, None], jnp.inf, d)
        if use_kth:
            if not exact:
                d = d.astype(jnp.dtype(dist_dtype))
                # The caller's threshold came from ITS OWN distance tile;
                # XLA may fuse/round the two programs' bf16 tiles
                # differently (measured on TPU: up to ~1 ulp divergence
                # each way), so inflate by 2 bf16 ulps — the mask becomes
                # a guaranteed near-superset of the internal selection's
                # (extra near-tie candidates only; the same approximation
                # class as recall_target misses) instead of randomly
                # dropping boundary neighbours. The exact-f32 path
                # matches bitwise and needs no margin.
                kth_rows = kth_rows * (1.0 + 2.0 ** -6)
            kth_b = kth_rows[..., None].astype(d.dtype)  # (B, block, 1)
        elif exact:
            kth_b = -jax.lax.top_k(-d, k)[0][..., -1:]
        else:
            d = d.astype(jnp.dtype(dist_dtype))
            kth_b = jax.lax.approx_min_k(
                d, k, recall_target=recall_target
            )[0][..., -1:]
        m_bool = jax.lax.stop_gradient(d <= kth_b)  # (B, block, win_n)
        mask = m_bool.astype(mm_dtype)
        # Per-(block, channel) anchor over the UNION of the block's masked
        # candidates: the tightest per-block upper bound of every
        # contributing value (a candidate no query masks cannot push the
        # anchor up), which keeps the exp's underflow horizon relative to
        # the neighbourhoods actually being aggregated.
        in_union = jnp.any(m_bool, axis=1)[..., None]  # (B, win_n, 1)
        anchor = jax.lax.stop_gradient(
            jnp.max(jnp.where(in_union, vals_w, -jnp.inf), axis=1, keepdims=True)
        )  # (B, 1, C)
        # Multi-level anchoring extends the exp's dynamic range (z down
        # to ~-(87 + (levels-1)*_SHIFT) instead of ~-87): level l
        # re-anchors l*_SHIFT lower, with values above that clipped to 1
        # by the min.  The min ALSO guards the overflow path: an unmasked
        # halo candidate can sit ABOVE the anchor (z > 0), and without
        # the clamp exp(z)=inf turns the masked matmul into 0*inf=NaN —
        # for masked candidates z <= 0 so the clamp is exact.
        #
        # Branch split (EXACT, per level): if s_l >= e^-_SHIFT then every
        # non-negligible contribution was representable in e_l (tail miss
        # <= win_n * e^-87 ~ e^-80, i.e. <= e^-16 relative); otherwise
        # every entry of e_l is < e^-_SHIFT, so z + l*_SHIFT < -_SHIFT
        # for all candidates and none of level l+1's entries hit the
        # clip.  Rows below the LAST level's horizon fall back to its
        # tiny-clamped log (bounded by the self-value floor below).
        z = t * (vals_w - anchor)  # <= 0 on masked candidates
        sums = []
        for l in range(levels):
            # where (not minimum): the anchor candidate sits at z == 0
            # exactly, and minimum's tie gradient would halve/zero its
            # cotangent — where keeps grad 1 on the z branch at the tie.
            z_l = z + l * _SHIFT
            e_l = jnp.exp(jnp.where(z_l > 0.0, 0.0, z_l)).astype(mm_dtype)
            sums.append(jnp.einsum(
                "bqw,bwc->bqc", mask, e_l, preferred_element_type=jnp.float32
            ))
        # The last level doubles as the deep-clamp fallback: rows whose
        # sum sits below the branch threshold keep the tiny-clamped VALUE
        # but freeze the gradient — log's backward there is cot/s with
        # s < e^-_SHIFT (possibly 0 -> cot/tiny), which overflows f32 to
        # inf and turns into NaN against the zero exp entries in the
        # einsum transpose.  Such rows are horizon-clamped anyway; their
        # softmax weights are tail noise.  Selected rows (s >= e^-_SHIFT)
        # keep exact gradients: cot/s <= cot * e^_SHIFT stays finite.
        raw_last = jnp.log(jnp.maximum(sums[-1], tiny))
        log_s = jnp.where(
            sums[-1] >= float(np.exp(-_SHIFT)),
            raw_last,
            jax.lax.stop_gradient(raw_last),
        ) - (levels - 1) * _SHIFT
        for l in range(levels - 2, -1, -1):
            log_s = jnp.where(
                sums[l] >= float(np.exp(-_SHIFT)),
                jnp.log(jnp.maximum(sums[l], tiny)) - l * _SHIFT,
                log_s,
            )
        if tie_correction:
            # Per-row mask count: a cheap lane reduction XLA fuses into
            # the mask producer (no extra HBM pass). Subtracting
            # log(max(m/k, 1)) renormalizes tie-exploded rows (m >> k) to
            # the k-candidate bias class; m <= k rows are untouched.
            m_rows = jax.lax.stop_gradient(
                jnp.sum(m_bool, axis=-1).astype(jnp.float32)
            )  # (B, block)
            log_s = log_s - jnp.log(
                jnp.maximum(m_rows / float(k), 1.0)
            )[..., None]
        out = anchor + log_s / t  # (B, block, C)
        return carry, out

    xs = (
        (q_tiles, row_ids, jnp.asarray(los), kth_tiles)
        if use_kth else (q_tiles, row_ids, jnp.asarray(los))
    )
    _, out = jax.lax.scan(scan_body, None, xs)
    out = out.transpose(1, 0, 2, 3).reshape(b, n_pad, c)[:, :n]
    if not exclude_self:
        # The self-match is in every mask, so LSE >= the row's own value
        # whenever its exp contribution survives; flooring at that value
        # turns deep-underflow clamps (a row whose whole neighbourhood sits
        # ~88*std/t0 below its block anchor) into a bounded error and is a
        # no-op otherwise.
        out = jnp.maximum(out, vals)
    return out.astype(values.dtype)
