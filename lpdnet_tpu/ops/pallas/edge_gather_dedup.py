"""Slab-dedup max-gather kernel — documented NEGATIVE result (off by default).

Idea: after Morton-sorting the points (``ops/morton.py``), the k=20 kNN
neighbours of a row span only ~5.2 distinct 16-row slabs (vs ~19.3 unsorted;
measured on synthetic submaps, including the learned-feature-space graph,
whose locality follows from feature smoothness). Compressing the per-edge
slab list to per-row (base, 16-bit row-mask) slots should cut the per-edge
kernel's slab loads ~3.9x.

Measured on v5e (B=64, N=4096, k=20, scan-chained):

  | kernel                           | C=64     | C=128    |
  |----------------------------------|----------|----------|
  | per-edge (``edge_gather.py``)    | 17.58 ms | 17.79 ms |
  | slab-dedup (this file)           | 28.87 ms | 29.13 ms |
  | dedup prep (XLA)                 |  2.18 ms |  2.24 ms |

The per-edge kernel's C-independence shows it is ISSUE-bound (~3.3 ns/edge,
one bf16 (16,128) vreg covers both widths); the dedup win must therefore
come from issuing fewer iterations. But the per-row ``fori_loop`` with a
data-dependent trip count costs ~21 ns/iteration (scalar loop bookkeeping +
the loop-carried (16,C) accumulator defeating Mosaic's unroll/pipeline), a
6.4x per-iteration penalty that swallows the 3.9x iteration reduction:
0.61x overall. Static-S variants cannot bound the slot count without
dropping neighbours (Morton locality has a long tail: p99 = 8 slabs, but an
adversarial cloud needs all 20).

Kept in-tree as the measured record (the analysis that motivated it also
motivated the windowed-kNN optimization, which DID pay — see
``ops/knn.py``); correctness is still tested against the per-edge kernel's
oracle so the record stays honest.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lpdnet_tpu.ops.pallas.edge_gather import SLAB


@partial(jax.jit, static_argnames=("slab",))
def dedup_slab_lists(idx: jnp.ndarray, slab: int = SLAB):
    """(B, M, K) neighbour indices -> per-row slab slots.

    Returns (bases (B,M,K), bits (B,M,K), nslab (B,M,1)): slot s of row m
    covers rows [bases[m,s], bases[m,s]+slab) with bits[m,s] selecting rows
    within the slab; only the first nslab[m] slots are meaningful.
    """
    si = jnp.sort(idx.astype(jnp.int32), axis=-1)
    base = (si // slab) * slab
    off = si - base
    first = jnp.concatenate(
        [jnp.ones_like(base[..., :1], jnp.bool_),
         base[..., 1:] != base[..., :-1]], -1)
    pos = jnp.cumsum(first.astype(jnp.int32), -1) - 1
    k = idx.shape[-1]
    slots = jnp.arange(k, dtype=jnp.int32)
    oh = pos[..., None] == slots  # (B, M, K, S)
    # Duplicate indices within a row must set their bit once (a sum of two
    # identical 1<<off would carry into the wrong bit).
    uniq = jnp.concatenate(
        [jnp.ones_like(si[..., :1], jnp.bool_), si[..., 1:] != si[..., :-1]],
        -1,
    )
    contrib = jnp.where(uniq, 1 << off, 0)
    bits = jnp.sum(
        jnp.where(oh, contrib[..., None], 0), axis=-2
    ).astype(jnp.int32)
    bases = jnp.max(
        jnp.where(oh, base[..., None], 0), axis=-2
    ).astype(jnp.int32)
    nslab = (pos[..., -1:] + 1).astype(jnp.int32)
    return bases, bits, nslab


def _edge_max_dedup_kernel(nslab_ref, base_ref, bits_ref, feat_ref, out_ref):
    tile_m = base_ref.shape[1]
    c = feat_ref.shape[2]
    dtype = feat_ref.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)
    out_rows = 8

    def blk_body(bi, _):
        base_out = pl.multiple_of(bi * out_rows, out_rows)
        rows = []
        for rr in range(out_rows):
            i = base_out + rr

            def slab_body(s, acc):
                b_ = pl.multiple_of(base_ref[0, i, s], SLAB)
                slab = feat_ref[0, pl.ds(b_, SLAB), :]
                bits = bits_ref[0, i, s]
                sel = ((bits >> row_iota) & 1) != 0
                return jnp.maximum(acc, jnp.where(sel, slab, neg_inf))

            acc = jax.lax.fori_loop(
                0, nslab_ref[0, i, 0], slab_body,
                jnp.full((SLAB, c), neg_inf, dtype),
            )
            rows.append(jnp.max(acc, axis=0, keepdims=True))
        out_ref[0, pl.ds(base_out, out_rows), :] = jnp.concatenate(rows, 0)
        return 0

    jax.lax.fori_loop(0, tile_m // out_rows, blk_body, 0, unroll=False)


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def edge_max_gather_dedup(
    features: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    tile_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b, m] = max_j features[b, idx[b, m, j]] via dedup'd slab slots."""
    b, n, c = features.shape
    _, m, _ = idx.shape
    if n % SLAB != 0:
        raise ValueError(f"N={n} must be a multiple of {SLAB}")
    if m % tile_m != 0:
        pad = tile_m - m % tile_m
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        return edge_max_gather_dedup(
            features, idx, tile_m=tile_m, interpret=interpret
        )[:, :m]
    bases, bits, nslab = dedup_slab_lists(idx)
    s_max = bases.shape[-1]
    grid = (b, m // tile_m)
    return pl.pallas_call(
        _edge_max_dedup_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, 1), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_m, s_max), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_m, s_max), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, c), lambda bi, mi: (bi, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c), features.dtype),
        interpret=interpret,
    )(nslab, bases, bits, features)
