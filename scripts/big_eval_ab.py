#!/usr/bin/env python
"""A/B retrieval audit on a LARGE synthetic world (round 4).

The CLI's smoke eval world (16 places x 2 runs = 64 query evals) has
1.56-pt recall granularity — too coarse to separate aggregation modes.
This builds a num_places x num_runs world (default 64 x 4 = 768 query
evals, 0.13-pt granularity) and evaluates any (checkpoint, aggregation)
pairs on the SAME world.

Usage:
  python scripts/big_eval_ab.py --pairs /tmp/r4/vfull_max:max \
      /tmp/r4/vfull_max:lse /tmp/r4b/vfull_lse:lse /tmp/r4/vfull_max:exact
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", nargs="+", required=True,
                    help="LOG_DIR:AGG with AGG in {max, lse, lse_tie, "
                         "exact}; 'exact' = max aggregation + exact kNN "
                         "oracle; 'lse_tie' = lse + per-row tie-explosion "
                         "bias correction (ops/lse.py tie_correction)")
    ap.add_argument("--places", type=int, default=64)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--json", default=None)
    ap.add_argument("--world", default="clustered",
                    choices=["clustered", "hard", "ground"],
                    help="world family (data/synthetic.py); 'hard'/"
                         "'ground' are the discriminating audits (round "
                         "5): tuned so the exact oracle lands <100%%")
    ap.add_argument("--families", type=int, default=8)
    ap.add_argument("--family_spread", type=float, default=0.12)
    ap.add_argument("--jitter", type=float, default=0.03)
    ap.add_argument("--occlusion", type=float, default=1.2)
    ap.add_argument("--ground_frac", type=float, default=0.6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from lpdnet_tpu.data.synthetic import make_synthetic_dataset
    from lpdnet_tpu.eval.evaluate import evaluate_model
    from lpdnet_tpu.models.model import build_model
    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.train.step import make_embed_fn
    from lpdnet_tpu.utils.checkpoint import CheckpointManager, load_config

    world = None
    results = []
    for spec in args.pairs:
        log_dir, agg = spec.rsplit(":", 1)
        cfg = load_config(log_dir)
        if cfg is None:
            raise SystemExit(f"no config.json under {log_dir}")
        if world is None:
            world_points = cfg.model.num_points
            world = make_synthetic_dataset(
                num_places=args.places, submaps_per_place=8,
                num_points=world_points, num_runs=args.runs,
                world=args.world, num_families=args.families,
                family_spread=args.family_spread, jitter=args.jitter,
                occlusion=args.occlusion, ground_frac=args.ground_frac,
                seed=args.seed,
            )
        elif cfg.model.num_points != world_points:
            raise SystemExit(
                f"{log_dir}: num_points={cfg.model.num_points} != the "
                f"world's {world_points} (built from the first pair) — "
                "A/B pairs must share num_points"
            )
        mcfg = cfg.model
        if agg == "exact":
            mcfg = dataclasses.replace(
                mcfg, aggregation="max", exact_knn=True
            )
        elif agg == "lse_tie":
            mcfg = dataclasses.replace(
                mcfg, aggregation="lse", lse_tie_correction=True
            )
        else:
            mcfg = dataclasses.replace(mcfg, aggregation=agg)
        _, state = create_train_state(cfg.model, cfg.train, jax.random.key(0))
        mgr = CheckpointManager(os.path.join(log_dir, "checkpoints"))
        state, epoch = mgr.restore(state)
        mgr.close()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        embed = make_embed_fn(build_model(mcfg))
        metrics = evaluate_model(
            embed, variables, world.database_sets, world.query_sets,
            world.loader, batch_size=args.batch,
        )
        row = {
            "log_dir": log_dir, "agg": agg, "epoch": int(epoch),
            "recall_at_1": float(metrics["ave_recall"][0]),
            "recall_at_5": float(metrics["ave_recall"][4]),
            "top1pct": float(metrics["ave_one_percent_recall"]),
        }
        results.append(row)
        print(f"[{log_dir}:{agg}] epoch {epoch}: recall@1 "
              f"{row['recall_at_1']:.2f}, @5 {row['recall_at_5']:.2f}, "
              f"top1% {row['top1pct']:.2f}", flush=True)

    world_cfg = {
        "world": args.world, "places": args.places, "runs": args.runs,
        "seed": args.seed,
    }
    if args.world != "clustered":
        world_cfg.update(
            families=args.families, family_spread=args.family_spread,
            jitter=args.jitter, occlusion=args.occlusion,
            ground_frac=args.ground_frac if args.world == "ground" else 0.0,
        )
    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"world": world_cfg, "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
