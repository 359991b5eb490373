#!/usr/bin/env python
"""Microbench: fused Pallas LSE kernel vs the XLA scan path (round 5).

Times both trunk aggregations at the flagship shape (B x 4096 points,
shipped geometry block 256 / window 128, k=20):

  * spatial  — space (B, N, 3),  values (B, N, 64), kth reuse available
  * feature  — space (B, N, 64), values (B, N, 128), no reuse possible

for the XLA scan (ops/lse.py, approx_min_k rt=0.85) and the fused kernel
(ops/pallas/lse_fused.py, in-kernel exact bf16 search), each with and
without a reused threshold, forward and forward+backward.

Usage: python scripts/bench_lse_fused.py [--batch 64] [--json PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain(fn, reps):
    """Repeat ``fn`` ``reps`` times inside ONE jit with a data dependency
    (output feeds the next call's values), so per-dispatch tunnel RTT
    (~30 ms here) amortizes out of the measurement."""
    import jax

    @jax.jit
    def many(space, values, *extra):
        def body(v, _):
            return fn(space, v, *extra).astype(values.dtype), None
        out, _ = jax.lax.scan(body, values, None, length=reps)
        return out

    return many


def _time_op(fn, space, values, *extra, iters=10, lo=4, hi=20):
    """Per-call seconds via the two-point slope (T(hi)-T(lo))/(hi-lo):
    constant dispatch overhead cancels."""
    out = {}
    for reps in (lo, hi):
        many = _chain(fn, reps)
        r = many(space, values, *extra)
        jax_block(r)  # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax_block(many(space, values, *extra))
            times.append(time.perf_counter() - t0)
        out[reps] = float(np.median(times))
    return (out[hi] - out[lo]) / (hi - lo)


def jax_block(out):
    import jax

    jax.block_until_ready(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.ops.lse import knn_lse_aggregate
    from lpdnet_tpu.ops.morton import morton_sort
    from lpdnet_tpu.ops.pallas.lse_fused import lse_aggregate_fused

    print(f"devices: {jax.devices()}", flush=True)
    b, n, k = args.batch, args.n, args.k
    tile, window = args.tile, args.window
    rng = np.random.RandomState(0)
    centers = rng.randn(b, 64, 3).astype(np.float32)
    pick = rng.randint(0, 64, size=(b, n))
    pts = centers[np.arange(b)[:, None], pick] + 0.05 * rng.randn(
        b, n, 3
    ).astype(np.float32)
    pts = np.asarray(morton_sort(jnp.asarray(pts)))
    feats = (pts @ rng.randn(3, 64).astype(np.float32)
             + 0.05 * rng.randn(b, n, 64).astype(np.float32))
    v64 = rng.randn(b, n, 64).astype(np.float32) + 0.5 * feats[..., :64]
    v128 = np.concatenate([v64, v64[..., ::-1]], axis=-1)

    cases = {
        "spatial": (jnp.asarray(pts), jnp.asarray(v64)),
        "feature": (jnp.asarray(feats), jnp.asarray(v128)),
    }

    # A reused threshold: the internal selection's own kth (what the
    # feature stage would hand over for the spatial graph).
    def kth_of(space):
        from lpdnet_tpu.ops.knn import knn_indices_and_dists

        _, d = knn_indices_and_dists(
            space, space, k, block=tile, window=window,
            dist_dtype="bfloat16", recall_target=0.85,
        )
        return d[..., -1]

    results = {}
    for name, (space, values) in cases.items():
        kth = jax.jit(kth_of)(space)
        jax_block(kth)

        def scan_op(s, v):
            return knn_lse_aggregate(
                s, v, k, t0=24.0, block=tile, window=window,
                dist_dtype="bfloat16", recall_target=0.85,
            )

        def scan_reuse_op(s, v, kt):
            return knn_lse_aggregate(
                s, v, k, t0=24.0, block=tile, window=window,
                dist_dtype="bfloat16", kth=kt,
            )

        def fused_op(s, v):
            return lse_aggregate_fused(
                s, v, k, t0=24.0, tile=tile, window=window,
            )

        def fused_reuse_op(s, v, kt):
            return lse_aggregate_fused(
                s, v, k, t0=24.0, tile=tile, window=window, kth=kt,
            )

        def grad_of(fn, *extra):
            def g(s, v):
                return jax.grad(
                    lambda vv: jnp.sum(fn(s, vv, *extra) ** 2)
                )(v)
            return g

        row = {}
        row["scan_fwd_ms"] = _time_op(
            scan_op, space, values, iters=args.iters) * 1e3
        row["fused_fwd_ms"] = _time_op(
            fused_op, space, values, iters=args.iters) * 1e3
        row["scan_reuse_fwd_ms"] = _time_op(
            scan_reuse_op, space, values, kth, iters=args.iters) * 1e3
        row["fused_reuse_fwd_ms"] = _time_op(
            fused_reuse_op, space, values, kth, iters=args.iters) * 1e3
        row["scan_bwd_ms"] = _time_op(
            grad_of(scan_op), space, values, iters=args.iters) * 1e3
        row["fused_bwd_ms"] = _time_op(
            grad_of(fused_op), space, values, iters=args.iters) * 1e3

        # Fidelity spot check on the same tensors.
        o_scan = np.asarray(jax.jit(scan_op)(space, values))
        o_fused = np.asarray(jax.jit(fused_op)(space, values))
        std = np.asarray(values).std(axis=1, keepdims=True)
        row["max_err_std"] = float(
            (np.abs(o_fused - o_scan) / np.maximum(std, 1e-6)).max()
        )
        cos = float(
            np.sum(o_fused * o_scan)
            / (np.linalg.norm(o_fused) * np.linalg.norm(o_scan))
        )
        row["cos_vs_scan"] = cos
        results[name] = row
        print(f"[{name}] " + "  ".join(
            f"{kk}={vv:.3f}" for kk, vv in row.items()), flush=True)

    print(json.dumps({"batch": b, "n": n, "results": results}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "n": n, "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
