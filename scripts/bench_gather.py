#!/usr/bin/env python
"""Measure the EdgeConv max-gather contenders at flagship shape
(VERDICT round-2 item 3: re-measure the one-hot MXU gather under Morton
windows — candidates 4096 -> 1024 made the round-1 rejection stale).

Contenders, all computing max_j features[b, idx[b,m,j]] at
B x N=4096 x K=20:
  * slab      — ops/pallas/edge_gather.edge_max_gather (the record holder,
                ~3 ns/edge issue-bound floor)
  * onehot_w  — ops/pallas/gather_mxu_windowed (windowed one-hot build +
                (TILE*K, win) @ (win, C) MXU matmul, max fused in-tile)
  * xla       — jnp.max(gather_neighbors(...), axis=2) reference

Scan-chained measurement (the tunnel's sync RTT would otherwise dominate).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def bench(b=64, n=4096, k=20, iters=10, block=512, window=256):
    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.ops.gather import gather_neighbors
    from lpdnet_tpu.ops.pallas.edge_gather import edge_max_gather
    from lpdnet_tpu.ops.pallas.gather_mxu_windowed import (
        _window_starts,
        edge_max_gather_windowed,
    )

    rs = np.random.RandomState(0)
    los = _window_starts(n, block, window)
    win = min(block + 2 * window, n)
    idx_np = np.zeros((b, n, k), np.int32)
    for blk, lo in enumerate(los):
        rows = slice(blk * block, (blk + 1) * block)
        idx_np[:, rows] = lo + rs.randint(0, win, (b, block, k))
    idx = jnp.asarray(idx_np)

    def chain(fn, feats):
        @jax.jit
        def run(feats, idx):
            def body(carry, _):
                out = fn(feats + carry * 1e-30, idx)
                return jnp.sum(out.astype(jnp.float32)), None

            carry, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=iters
            )
            return carry

        np.asarray(run(feats, idx))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(feats, idx))
        return (time.perf_counter() - t0) / iters * 1e3

    for c in (64, 128):
        feats = jnp.asarray(
            rs.randn(b, n, c).astype(np.float32)
        ).astype(jnp.bfloat16)
        rows = {
            "xla": lambda f, i: jnp.max(gather_neighbors(f, i), axis=2),
            "slab": lambda f, i: edge_max_gather(f, i),
            "onehot_w": lambda f, i: edge_max_gather_windowed(
                f, i, block=block, window=window
            ),
            "onehot_i16": lambda f, i: edge_max_gather_windowed(
                f, i, block=block, window=window, cmp_dtype="int16"
            ),
            "onehot_f16": lambda f, i: edge_max_gather_windowed(
                f, i, block=block, window=window, cmp_dtype="float16"
            ),
            "onehot_t128": lambda f, i: edge_max_gather_windowed(
                f, i, block=block, window=window, tile_m=128,
                cmp_dtype="int16",
            ),
        }
        for name, fn in rows.items():
            try:
                ms = chain(fn, feats)
                print(
                    f"C={c} {name:9s}: {ms:7.2f} ms/call "
                    f"({ms / (b * n * k) * 1e6:.2f} ns/edge)",
                    flush=True,
                )
            except Exception as e:
                print(f"C={c} {name:9s}: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    kw = {}
    if len(sys.argv) > 1:
        kw["b"] = int(sys.argv[1])
    bench(**kw)
