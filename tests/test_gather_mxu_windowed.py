"""Windowed one-hot MXU max-gather vs the XLA oracle (interpret mode on
CPU): correctness for in-window Morton indices, including clipped edge
blocks (VERDICT round-2 item 3's re-measurement kernel)."""

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.pallas.gather_mxu_windowed import (
    _window_starts,
    edge_max_gather_windowed,
)


def _window_indices(rng, b, n, k, block, window):
    """Random indices that respect the Morton-window contract."""
    los = _window_starts(n, block, window)
    win = min(block + 2 * window, n)
    idx = np.zeros((b, n, k), np.int32)
    for blk, lo in enumerate(los):
        rows = slice(blk * block, (blk + 1) * block)
        idx[:, rows] = lo + rng.randint(0, win, (b, block, k))
    return idx


def test_window_starts_match_sp_clipping():
    los = _window_starts(4096, 512, 256)
    assert los[0] == 0  # clipped at the left edge
    assert los[-1] == 4096 - 1024  # clipped at the right edge
    assert np.all(np.diff(los) >= 0)


def test_matches_oracle(rng):
    b, n, k, c = 2, 256, 5, 128
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(_window_indices(rng, b, n, k, block=64, window=32))
    got = np.asarray(
        edge_max_gather_windowed(
            feats, idx, block=64, window=32, tile_m=32, interpret=True
        )
    )
    want = np.asarray(jnp.max(gather_neighbors(feats, idx), axis=2))
    # bf16 one-hot matmul: exact selection, values rounded to bf16.
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
    # The max picks the same rows: check against bf16-rounded features.
    want_bf16 = np.asarray(
        jnp.max(
            gather_neighbors(feats.astype(jnp.bfloat16).astype(jnp.float32),
                             idx),
            axis=2,
        )
    )
    np.testing.assert_allclose(got, want_bf16, rtol=1e-6, atol=1e-6)


def test_full_window_degenerates(rng):
    # window >= N: every block sees the whole cloud (lo = 0 everywhere).
    b, n, k, c = 1, 128, 4, 128
    feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    got = np.asarray(
        edge_max_gather_windowed(
            feats, idx, block=64, window=128, tile_m=32, interpret=True
        )
    )
    want = np.asarray(
        jnp.max(
            gather_neighbors(feats.astype(jnp.bfloat16).astype(jnp.float32),
                             idx),
            axis=2,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
