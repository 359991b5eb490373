#!/usr/bin/env python
"""Benchmark: 4096-pt submap inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "submaps_per_sec_per_chip", "value": N, "unit": "submaps/s",
   "vs_baseline": N / 1000}

``vs_baseline`` is measured against the project north-star from
BASELINE.json: >= 1000 submaps/sec/chip for full LPD-Net inference
(on-device 10-D eigen-features + dual-kNN graph trunk + NetVLAD) on v5e.
The PyTorch reference publishes no throughput numbers (BASELINE.md), so the
north-star target is the baseline denominator.

Extra diagnostic metrics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_throughput(
    batch_sizes=(16, 32, 64),
    iters: int = 10,
    trunk: str = "lpdnet",
):
    """Time ``iters`` forwards chained inside ONE jitted lax.scan.

    Two reasons: (1) this backend's ``block_until_ready`` does not wait for
    remote completion (only host transfer does), and (2) a single dispatch
    amortizes the ~24 ms tunnel round-trip out of the measurement. The scan
    carry perturbs the input each iteration so XLA cannot hoist the forward
    out of the loop.
    """
    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.configs import ModelConfig
    from lpdnet_tpu.models.model import init_model

    cfg = ModelConfig(trunk=trunk, compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)

    @jax.jit
    def run(variables, points):
        def body(carry, _):
            out = model.apply(
                variables, points + carry * 1e-30, train=False
            )
            return jnp.sum(out), None
        carry, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return carry

    rs = np.random.RandomState(0)
    best = 0.0
    best_bs = 0
    for bs in batch_sizes:
        pts = jnp.asarray(
            rs.randn(bs, cfg.num_points, 3).astype(np.float32) * 0.3
        )
        try:
            np.asarray(run(variables, pts))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(run(variables, pts))  # host transfer = full sync
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM at large batch: stop scaling up
            print(f"batch {bs}: {type(e).__name__}: {e}", file=sys.stderr)
            break
        rate = bs * iters / dt
        print(
            f"batch {bs}: {rate:.1f} submaps/s ({dt / iters * 1e3:.2f} ms/iter)",
            file=sys.stderr,
        )
        if rate > best:
            best, best_bs = rate, bs
    return best, best_bs


def bench_train_step(batch_queries=2, iters=8):
    """Lazy-quadruplet training-step throughput (BASELINE config 4):
    forward + loss + backward + Adam update on reference-sized tuples
    (1 query + 2 positives + 18 negatives + other_neg, 4096 points)."""
    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.configs import ModelConfig, TrainConfig
    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.train.step import make_train_step

    cfg_m = ModelConfig(trunk="lpdnet", compute_dtype="bfloat16")
    cfg_t = TrainConfig(batch_num_queries=batch_queries)
    model, state = create_train_state(cfg_m, cfg_t, jax.random.key(0))
    step = make_train_step(model, cfg_t.loss, donate=False)

    rs = np.random.RandomState(0)
    n = cfg_m.num_points
    batch = {
        "query": jnp.asarray(rs.randn(batch_queries, n, 3).astype(np.float32) * 0.3),
        "positives": jnp.asarray(rs.randn(batch_queries, 2, n, 3).astype(np.float32) * 0.3),
        "negatives": jnp.asarray(rs.randn(batch_queries, 18, n, 3).astype(np.float32) * 0.3),
        "other_neg": jnp.asarray(rs.randn(batch_queries, n, 3).astype(np.float32) * 0.3),
    }
    state, loss = step(state, batch)
    np.asarray(loss)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    queries_per_sec = batch_queries * iters / dt
    submaps_per_sec = queries_per_sec * 22
    print(
        f"train step: {dt / iters * 1e3:.1f} ms "
        f"({queries_per_sec:.2f} queries/s, {submaps_per_sec:.1f} submaps/s)",
        file=sys.stderr,
    )
    return queries_per_sec, submaps_per_sec


def main():
    import argparse

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--mode", default="inference",
                    choices=["inference", "train", "pointnetvlad"])
    args = ap.parse_args()

    enable_compilation_cache()
    if args.mode == "pointnetvlad":
        best, best_bs = bench_throughput(trunk="pointnetvlad")
        print(json.dumps({
            "metric": "pointnetvlad_submaps_per_sec_per_chip",
            "value": round(best, 2),
            "unit": "submaps/s",
            "vs_baseline": round(best / 1000.0, 4),
            "detail": {"model": "pointnetvlad bf16 (STN + shared MLP + NetVLAD)",
                       "num_points": 4096, "best_batch": best_bs},
        }))
        return
    if args.mode == "train":
        qps, sps = bench_train_step()
        print(json.dumps({
            "metric": "train_queries_per_sec_per_chip",
            "value": round(qps, 3),
            "unit": "queries/s",
            "vs_baseline": round(sps / 1000.0, 4),
            "detail": {
                "model": "lpdnet bf16, lazy quadruplet, B=2 ref config",
                "tuples": "1q + 2pos + 18neg + other",
                "submaps_per_sec": round(sps, 1),
            },
        }))
        return
    if args.trace:
        import jax.profiler

        jax.profiler.start_trace(args.trace)
    best, best_bs = bench_throughput()
    if args.trace:
        import jax.profiler

        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)
    result = {
        "metric": "submaps_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "submaps/s",
        "vs_baseline": round(best / 1000.0, 4),
        "detail": {
            "model": "lpdnet bf16 (on-device 10-D features + dual-kNN + NetVLAD)",
            "num_points": 4096,
            "best_batch": best_bs,
            "baseline": "north-star 1000 submaps/s/chip (BASELINE.json)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
