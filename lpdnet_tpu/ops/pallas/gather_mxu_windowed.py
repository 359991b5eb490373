"""Windowed one-hot MXU max-gather (Pallas TPU kernel) — the round-3
re-measurement of the round-1 one-hot negative result.

Round 1 rejected the one-hot MXU gather at full scan width: building the
(rows*K, N=4096) one-hot in VMEM cost ~15 ms at B=64 — the VPU compare
work dominated (PERF_LOG). Morton windows changed the economics: every
sorted row's neighbours now live inside its block's candidate window of
``win = block + 2*w`` rows (1024 at the production 512/256 defaults), so
the one-hot narrows 4x AND the matmul contracts over ``win`` instead of
``N``. This kernel additionally FUSES the max-over-neighbours into the
tile (reshape (TILE, K, C) -> max over K in VMEM), so unlike the round-1
kernel the (B, M, K, C) edge tensor never exists.

Contract: indices must come from the Morton-window kNN (``knn_window``
configs) — out-of-window indices produce an all-zero one-hot row and
would silently contribute 0 to the max; ``tests/test_gather_mxu_windowed``
pins in-window behavior against the XLA oracle.

Oracle: ``jnp.max(gather_neighbors(...), axis=2)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_starts(n: int, block: int, window: int) -> np.ndarray:
    """Candidate-window start row per sorted block (ops/knn.py clipping)."""
    nb = n // block
    win = min(block + 2 * window, n)
    return np.clip(
        np.arange(nb) * block - window, 0, n - win
    ).astype(np.int32)


def _kernel(idx_ref, win_ref, out_ref, *, cmp_dtype=jnp.int32):
    # idx_ref: (1, 1, TILE_M, K) int32 — window-LOCAL neighbour indices
    # win_ref: (1, 1, WIN, C)          — this block's candidate window
    # out_ref: (1, 1, TILE_M, C)       — max over the K gathered rows
    tile_m, k = idx_ref.shape[2], idx_ref.shape[3]
    win = win_ref.shape[2]
    c = win_ref.shape[3]

    # The one-hot build is the kernel's bottleneck (VPU compares); 16-bit
    # compare dtypes double the lanes per op. Window-local indices are
    # < win <= 4096, so int16 is exact (and float16 up to 2048).
    idx = idx_ref[0, 0].astype(cmp_dtype)  # (TILE_M, K)
    col = jax.lax.broadcasted_iota(cmp_dtype, (tile_m, k, win), 2)
    onehot = (col == idx[:, :, None]).astype(jnp.bfloat16)
    onehot = onehot.reshape(tile_m * k, win)
    table = win_ref[0, 0].astype(jnp.bfloat16)  # (WIN, C)
    gathered = jnp.dot(
        onehot, table, preferred_element_type=jnp.float32
    )  # (TILE_M*K, C)
    out_ref[0, 0] = jnp.max(
        gathered.reshape(tile_m, k, c), axis=1
    ).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("block", "window", "tile_m", "interpret", "cmp_dtype"),
)
def edge_max_gather_windowed(
    features: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    block: int,
    window: int,
    tile_m: int = 64,
    interpret: bool = False,
    cmp_dtype: str = "int32",
) -> jnp.ndarray:
    """``out[b, m] = max_j features[b, idx[b, m, j]]`` for Morton-window
    indices: row ``m``'s neighbours lie in its block's candidate window.

    Args:
      features: (B, N, C); N divisible by ``block``.
      idx: (B, N, K) int32 GLOBAL indices, in-window per the contract.
      block/window: the ``knn_block``/``knn_window`` the indices came from.

    Returns:
      (B, N, C) features.dtype.
    """
    b, n, c = features.shape
    _, m, k = idx.shape
    if m != n:
        raise ValueError(f"windowed gather needs M == N, got {m} vs {n}")
    if n % block:
        raise ValueError(f"N={n} not divisible by block={block}")
    if block % tile_m:
        raise ValueError(f"block={block} not divisible by tile_m={tile_m}")
    nb = n // block
    los = _window_starts(n, block, window)
    win = min(block + 2 * window, n)

    # XLA-side window slicing: (B, nb, WIN, C) — contiguous copies, tiny
    # HBM cost next to the gather itself; lets the kernel use plain
    # BlockSpecs (overlapping windows are inexpressible as block indices).
    wins = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(features, int(lo), win, axis=1)
         for lo in los],
        axis=1,
    )
    idx_local = idx.reshape(b, nb, block, k) - jnp.asarray(
        los, jnp.int32
    )[None, :, None, None]

    grid = (b, nb, block // tile_m)
    out = pl.pallas_call(
        partial(_kernel, cmp_dtype=jnp.dtype(cmp_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_m, k),
                lambda bi, ni, ti: (bi, ni, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, win, c),
                lambda bi, ni, ti: (bi, ni, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_m, c),
            lambda bi, ni, ti: (bi, ni, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, nb, block, c), features.dtype
        ),
        interpret=interpret,
    )(idx_local.astype(jnp.int32), wins)
    return out.reshape(b, n, c)
