"""Fused neighbour-gather + max-aggregation Pallas kernel.

The post-aggregation EdgeConv (``lpdnet_tpu.models.lpdnet.EdgeConv``,
``bn_placement='post'``) needs ``out[b, m] = max_j feat[b, idx[b, m, j]]``.
XLA's row gather runs at ~8 ns/row (latency-bound fetch loop); this kernel
keeps the whole per-cloud feature table in VMEM and turns each neighbour
access into one *aligned-slab* vector load:

  * Mosaic cannot load a vector at an arbitrary dynamic sublane offset
    (must be 8/16-aligned), so for index r we load the aligned SLAB-row
    window containing r;
  * instead of reducing each slab to its selected row (a cross-sublane
    reduce per edge), the masked slabs are **max-accumulated as slabs** —
    2 VPU ops per edge — and a single cross-sublane max folds the
    accumulator to the output row at the end;
  * indices live in SMEM (scalar reads drive the dynamic slices).

Oracle: ``jnp.max(gather_neighbors(feat, idx), axis=2)`` (pure XLA), tested
in ``tests/test_pallas_gather.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 16  # aligned sublane window (bf16 native tile height)
# The backward works on f32 (the accumulator must be f32 anyway, and
# Mosaic's i1-relayout limitation forces f32 compare/select), whose native
# sublane tile is 8: an 8-row slab halves the per-edge masking work and
# read-modify-write traffic vs the bf16 16-row slab.
SLAB_BWD = 8


def _edge_max_kernel(base_ref, off_ref, feat_ref, out_ref):
    # base_ref: (1, TILE_M, K) int32 in SMEM — SLAB-aligned row bases
    # off_ref:  (1, TILE_M, K) int32 in SMEM — row offset within the slab
    # feat_ref: (1, N, C) in VMEM
    # out_ref:  (1, TILE_M, C) in VMEM
    # base/offset are precomputed host-side: the per-edge //SLAB and %SLAB
    # would otherwise serialize on the scalar unit.
    tile_m, k = base_ref.shape[1], base_ref.shape[2]
    c = feat_ref.shape[2]
    dtype = feat_ref.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)
    # Stores must also hit aligned sublane offsets: build OUT_ROWS output
    # rows per iteration and store them as one aligned block.
    out_rows = 8

    def blk_body(bi, _):
        base_out = pl.multiple_of(bi * out_rows, out_rows)
        rows = []
        for rr in range(out_rows):
            i = base_out + rr
            acc = jnp.full((SLAB, c), neg_inf, dtype)
            for j in range(k):
                base = pl.multiple_of(base_ref[0, i, j], SLAB)
                slab = feat_ref[0, pl.ds(base, SLAB), :]  # (SLAB, C)
                sel = row_iota == off_ref[0, i, j]  # (SLAB, 1)
                acc = jnp.maximum(acc, jnp.where(sel, slab, neg_inf))
            rows.append(jnp.max(acc, axis=0, keepdims=True))
        out_ref[0, pl.ds(base_out, out_rows), :] = jnp.concatenate(rows, 0)
        return 0

    jax.lax.fori_loop(0, tile_m // out_rows, blk_body, 0, unroll=False)


def _edge_max_bwd_kernel(
    base_ref, off_ref, dout_ref, out_ref, feat_ref, dfeat_ref, *accs
):
    # base/off:  (1, TILE_M, K) int32 SMEM — slab-aligned neighbour rows
    # dout_ref:  (1, TILE_M, C) cotangent of the aggregated output
    # out_ref:   (1, TILE_M, C) forward output (the per-row channel maxima)
    # feat_ref:  (1, N, C) forward input features
    # dfeat_ref: (1, N, C) final cotangent (written once at the last tile)
    # accs:      VMEM scratch accumulators, (N, C) f32 each. Edges rotate
    #   over them by j-parity: the serializing store->load dependency of a
    #   single accumulator's read-modify-write per edge splits into nbuf
    #   independent chains (measured 28 -> 11 ms at C=64 with 5). Scratch
    #   persists across the sequential grid; the last tile folds them.
    #
    # dfeat[n, c] += sum over edges (m, j) with idx=n of
    #   dout[m, c] * [feat[n, c] == out[m, c]]
    # — the eq-mask routing of max's gradient. Ties double-count (measure
    # zero for continuous activations; documented deviation from jnp.max's
    # tie-splitting VJP).
    tile_m, k = base_ref.shape[1], base_ref.shape[2]
    n, c = feat_ref.shape[1], feat_ref.shape[2]
    dtype = dfeat_ref.dtype
    nbuf = len(accs)

    @pl.when(pl.program_id(1) == 0)
    def _():
        for a in accs:
            a[...] = jnp.zeros((n, c), dtype)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB_BWD, 1), 0)
    blk = 8  # aligned read granularity for dout/out rows

    def blk_body(bi, _):
        base_m = pl.multiple_of(bi * blk, blk)
        dout_blk = dout_ref[0, pl.ds(base_m, blk), :]  # (8, C)
        out_blk = out_ref[0, pl.ds(base_m, blk), :]  # (8, C)
        for rr in range(blk):
            m = base_m + rr
            dout_m = dout_blk[rr : rr + 1, :]  # (1, C) static slice
            out_m = out_blk[rr : rr + 1, :]
            # All compare/select math in f32: a bf16 eq yields an i1 mask in
            # 16-sublane packed layout that Mosaic cannot relayout for an
            # f32-operand select ("invalid relayout ... vector<16x128xi1>").
            # bf16 -> f32 is exact, so equality is preserved (the caller
            # passes f32 features). Broadcasts are materialized
            # arithmetically (broadcast_to keeps a replicated layout with
            # the same relayout problem).
            zeros = jnp.zeros((SLAB_BWD, c), dtype)
            out_b = zeros + out_m.astype(dtype)
            dout_b = zeros + dout_m.astype(dtype)
            neg_inf = jnp.asarray(-jnp.inf, dtype)
            for j in range(k):
                acc_ref = accs[j % nbuf]
                nbase = pl.multiple_of(base_ref[0, m, j], SLAB_BWD)
                sel = row_iota == off_ref[0, m, j]  # (SLAB_BWD, 1)
                slab = feat_ref[0, pl.ds(nbase, SLAB_BWD), :]
                # where(sel, slab, -inf) folds the row-select into the
                # value compare.
                cand = jnp.where(sel, slab, neg_inf)  # (SLAB_BWD, C)
                contrib = jnp.where(cand == out_b, dout_b, zeros)
                acc = acc_ref[pl.ds(nbase, SLAB_BWD), :]
                acc_ref[pl.ds(nbase, SLAB_BWD), :] = acc + contrib
        return 0

    jax.lax.fori_loop(0, tile_m // blk, blk_body, 0, unroll=False)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        total = accs[0][...]
        for a in accs[1:]:
            total = total + a[...]
        dfeat_ref[0] = total


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def _edge_max_bwd(
    features: jnp.ndarray,
    idx: jnp.ndarray,
    out: jnp.ndarray,
    dout: jnp.ndarray,
    *,
    tile_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cotangent of ``edge_max_gather`` w.r.t. ``features``."""
    b, n, c = features.shape
    _, m, k = idx.shape
    if m % tile_m != 0:
        pad = tile_m - m % tile_m
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        # Padded rows carry zero cotangent: they contribute nothing.
        out = jnp.pad(out, ((0, 0), (0, pad), (0, 0)))
        dout = jnp.pad(dout, ((0, 0), (0, pad), (0, 0)))
        m += pad

    idx = idx.astype(jnp.int32)
    base = (idx // SLAB_BWD) * SLAB_BWD
    off = idx - base
    grid = (b, m // tile_m)
    # f32 feature/output/cotangent views: exact (bf16 -> f32), and the f32
    # sublane tile is 8, halving the per-edge slab work (see SLAB_BWD).
    features = features.astype(jnp.float32)
    out = out.astype(jnp.float32)
    dout = dout.astype(jnp.float32)
    # Accumulator count: as many independent RMW chains as a ~6 MB VMEM
    # scratch budget allows (larger allocations fail to compile on v5e at
    # these block sizes), capped at 5 — the measured knee of the chain-
    # splitting speedup at C=64.
    nbuf = max(1, min(5, (6 * 2**20) // (n * c * 4)))
    return pl.pallas_call(
        _edge_max_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, k), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_m, k), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_m, c), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, c), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda bi, mi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # fp32 accumulator regardless of activation dtype: a point can
        # receive many small contributions.
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, c), jnp.float32) for _ in range(nbuf)
        ],
        interpret=interpret,
    )(base, off, dout, out, features)


@jax.custom_vjp
def edge_max_gather_trainable(features: jnp.ndarray, idx: jnp.ndarray):
    """Differentiable ``edge_max_gather``: Pallas forward + Pallas eq-mask
    scatter backward (the XLA gather+max VJP pays a ~50 ms scatter per conv
    in the reference-sized train step)."""
    return edge_max_gather(features, idx)


def _emgt_fwd(features, idx):
    out = edge_max_gather(features, idx)
    return out, (features, idx, out)


def _emgt_bwd(res, dout):
    features, idx, out = res
    dfeat = _edge_max_bwd(features, idx, out, dout)
    return dfeat.astype(features.dtype), None


edge_max_gather_trainable.defvjp(_emgt_fwd, _emgt_bwd)


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def edge_max_gather(
    features: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    tile_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, m] = max_j features[b, idx[b, m, j]].

    Args:
      features: (B, N, C) per-point features; N must be a multiple of SLAB.
      idx: (B, M, K) int32 neighbour indices.
      tile_m: output rows per kernel step.

    Returns:
      (B, M, C), features.dtype.
    """
    b, n, c = features.shape
    _, m, k = idx.shape
    if n % SLAB != 0:
        raise ValueError(f"N={n} must be a multiple of {SLAB}")
    if tile_m % 8 != 0:
        # The kernel stores 8 output rows per aligned block; a non-multiple
        # tile would leave trailing rows of each tile unwritten.
        raise ValueError(f"tile_m={tile_m} must be a multiple of 8")
    if m % tile_m != 0:
        pad = tile_m - m % tile_m
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        return edge_max_gather(
            features, idx, tile_m=tile_m, interpret=interpret
        )[:, :m]

    grid = (b, m // tile_m)
    idx = idx.astype(jnp.int32)
    base = (idx // SLAB) * SLAB
    off = idx - base
    return pl.pallas_call(
        _edge_max_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_m, k),
                lambda bi, mi: (bi, mi, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, tile_m, k),
                lambda bi, mi: (bi, mi, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n, c),
                lambda bi, mi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, c),
            lambda bi, mi: (bi, mi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, c), features.dtype),
        interpret=interpret,
    )(base, off, features)
