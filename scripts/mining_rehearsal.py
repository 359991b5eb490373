#!/usr/bin/env python
"""Oxford-scale hard-negative-mining rehearsal (VERDICT round 1, item 6).

Builds a synthetic training world at reference cardinality (~21.7k submaps
of 4096 points — SURVEY C7/C16), then runs a mining-enabled training
segment on the real chip and reports:

  * full-train-set descriptor cache refresh wall time (the §3.5
    "FULL-DATASET FORWARD SWEEP" hotspot) at true scale;
  * train step time WITH hard-negative tuples vs the random-negative
    baseline (cache-lookup + assembly dilation);
  * host RSS (the in-memory cloud cache is ~1 GB at this scale).

Usage:
  python scripts/mining_rehearsal.py --num_submaps 21700 --queries 120
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build_world(num_submaps: int, num_points: int, group: int = 10,
                neg_pool: int = 2000, seed: int = 0):
    """Reference-cardinality training dict + in-memory clouds.

    Structure matches the Oxford pickle semantics (positives = same place
    group, negatives = far places) at full size; cloud CONTENT is random
    (mining cost depends only on shapes/cardinality). Negatives are stored
    as int32 arrays: Oxford's ~18k-long python lists per query would cost
    ~5 GB of pointers at this scale — the array form is the same data at
    347 MB and TupleSampler consumes either.
    """
    rng = np.random.RandomState(seed)
    clouds = rng.randn(num_submaps, num_points, 3).astype(np.float32) * 0.3
    n_groups = num_submaps // group
    queries = {}
    for i in range(num_submaps):
        g = i // group
        pos = [j for j in range(g * group, min((g + 1) * group, num_submaps))
               if j != i]
        # Sampled far-negative pool (mining itself subsamples to
        # cfg.mining.sampled_negatives anyway).
        negs = rng.randint(0, num_submaps, neg_pool * 2)
        negs = negs[(negs // group) != g][:neg_pool].astype(np.int32)
        queries[i] = {"query": i, "positives": pos, "negatives": negs}
    print(f"world: {num_submaps} submaps, {n_groups} places, "
          f"rss={rss_gb():.2f} GB", file=sys.stderr)
    return queries, clouds


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_submaps", type=int, default=21_700)
    ap.add_argument("--num_points", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=120,
                    help="training queries to step through per phase")
    ap.add_argument("--batch_num_queries", type=int, default=2)
    ap.add_argument("--eval_batch", type=int, default=64)
    ap.add_argument("--agg", default="max", choices=["max", "lse"],
                    help="trunk neighbour aggregation (ops/lse.py)")
    args = ap.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from lpdnet_tpu.configs import ModelConfig, TrainConfig
    from lpdnet_tpu.data.tuples import TupleSampler
    from lpdnet_tpu.train.mining import DescriptorCache
    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.train.step import make_embed_fn, make_train_step
    from lpdnet_tpu.utils.pipeline import prefetch_iterator

    queries, clouds = build_world(args.num_submaps, args.num_points)
    sampler = TupleSampler(
        queries, lambda i: clouds[i], num_pos=2, num_neg=18, cache=False
    )

    cfg_m = ModelConfig(
        trunk="lpdnet", compute_dtype="bfloat16", aggregation=args.agg
    )
    cfg_t = TrainConfig(batch_num_queries=args.batch_num_queries)
    model, state = create_train_state(cfg_m, cfg_t, jax.random.key(0))
    step = make_train_step(model, cfg_t.loss, donate=False)
    embed = make_embed_fn(model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    cache = DescriptorCache(sampler, batch_size=args.eval_batch)

    # --- cache refresh at full 21.7k scale (compile + 2 timed sweeps) ----
    cache.refresh(embed, variables, transfer_dtype="int16")
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        cache.refresh(embed, variables, transfer_dtype="int16")
        times.append(time.perf_counter() - t0)
    refresh_s = min(times)
    sweep_rate = args.num_submaps / refresh_s
    print(f"cache refresh: {refresh_s:.2f}s for {args.num_submaps} submaps "
          f"({sweep_rate:.0f}/s), rss={rss_gb():.2f} GB", file=sys.stderr)

    # --- step time: random negatives vs hard negatives ------------------
    def run_phase(hard_fn, label):
        rng = np.random.RandomState(1)
        batches = prefetch_iterator(
            sampler.epoch_batches(
                args.batch_num_queries, rng, hard_negs_fn=hard_fn,
                rotate=True, jitter=True, transfer_dtype="int16",
            ),
            depth=3,
        )
        n_steps = args.queries // args.batch_num_queries
        nonlocal state
        it = iter(batches)
        _, batch = next(it)  # compile/warm outside timing
        state, loss = step(state, batch)
        np.asarray(loss)
        t0 = time.perf_counter()
        done = 0
        for _, batch in it:
            state, loss = step(state, batch)
            done += 1
            if done >= n_steps:
                break
        np.asarray(loss)
        dt = (time.perf_counter() - t0) / max(done, 1)
        print(f"{label}: {dt * 1e3:.1f} ms/step "
              f"({args.batch_num_queries * 22 / dt:.0f} submaps/s)",
              file=sys.stderr)
        return dt

    t_random = run_phase(None, "random negatives")

    def hard_fn(idx, rng):
        return cache.hard_negatives(idx, 10, rng, sampled_pool=4000)

    t_hard = run_phase(hard_fn, "hard negatives")

    import json

    print(json.dumps({
        "metric": "mining_cache_refresh_seconds_21k",
        "value": round(refresh_s, 2),
        "unit": "s",
        "detail": {
            "num_submaps": args.num_submaps,
            "sweep_submaps_per_sec": round(sweep_rate, 1),
            "step_ms_random": round(t_random * 1e3, 1),
            "step_ms_hard": round(t_hard * 1e3, 1),
            "dilation_pct": round((t_hard / t_random - 1) * 100, 1),
            "rss_gb": round(rss_gb(), 2),
        },
    }))


if __name__ == "__main__":
    main()
