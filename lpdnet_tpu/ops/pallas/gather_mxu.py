"""Neighbour gather as a one-hot MXU matmul (Pallas TPU kernel).

XLA's row gather on TPU runs far below HBM bandwidth (~10 GB/s effective for
the (B, N, k) neighbour patterns of this model — measured in SURVEY §7's
bench loop). The TPU-native alternative: for a tile of gather rows, build
the one-hot selection matrix **in VMEM** (compare a column iota against the
indices — never materialized in HBM) and multiply it with the per-cloud
feature table, turning the gather into a dense (TILE*K, N) @ (N, C) matmul
on the MXU with fp32 accumulation.

FLOP cost is B*M*K*N*C*2 (vs zero for a "real" gather), but the MXU is so
much faster than the scalar-gather path that it wins by ~4-10x for the
shapes here (N=4096, K=20, C<=128). The feature table stays resident in
VMEM across all row tiles of the same cloud (the block index map pins it to
the batch index).

Oracle: ``lpdnet_tpu.ops.gather.gather_neighbors`` (pure XLA), compared in
``tests/test_pallas_gather.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, feat_ref, out_ref):
    # idx_ref:  (1, TILE_M, K) int32     — neighbour indices for this tile
    # feat_ref: (1, N, C) float32        — the cloud's full feature table
    # out_ref:  (1, TILE_M, K, C) f32    — gathered neighbour features
    tile_m, k = idx_ref.shape[1], idx_ref.shape[2]
    n = feat_ref.shape[1]
    c = feat_ref.shape[2]

    # One-hot built with N as the lane dim throughout (Mosaic cannot
    # reshape across the lane dimension; merging leading sublane dims is
    # fine).
    idx3 = idx_ref[0]  # (TILE_M, K)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, k, n), 2)
    onehot = (col == idx3[:, :, None]).astype(jnp.bfloat16)
    onehot = onehot.reshape(tile_m * k, n)
    table = feat_ref[0].astype(jnp.bfloat16)  # (N, C)
    gathered = jnp.dot(
        onehot, table, preferred_element_type=jnp.float32
    )  # (TILE*K, C)
    out_ref[0] = gathered.reshape(tile_m, k, c)


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def gather_neighbors_mxu(
    features: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    tile_m: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather per-neighbour features: out[b, m, j] = features[b, idx[b, m, j]].

    Args:
      features: (B, N, C) float per-point features. N and C should be
        multiples of the fp32 tile (8, 128) for best layout; C is zero-padded
        to at least 128 lanes internally by Mosaic.
      idx: (B, M, K) int32 indices into the N axis.
      tile_m: gather rows per kernel step (VMEM one-hot is TILE_M*K x N
        bf16 — keep under a few MB).

    Returns:
      (B, M, K, C) float32.
    """
    b, n, c = features.shape
    _, m, k = idx.shape
    if m % tile_m != 0:
        # Pad rows to the tile; padded rows gather index 0, then dropped.
        pad = tile_m - m % tile_m
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        out = gather_neighbors_mxu(
            features, idx, tile_m=tile_m, interpret=interpret
        )
        return out[:, :m]

    grid = (b, m // tile_m)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_m, k),
                lambda bi, mi: (bi, mi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, c),
                lambda bi, mi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, k, c),
            lambda bi, mi: (bi, mi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, k, c), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), features.astype(jnp.float32))
    return out
