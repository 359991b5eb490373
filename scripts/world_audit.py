#!/usr/bin/env python
"""Discriminating-world fidelity audit across aggregation modes (round 5).

Runs the retrieval benchmark AND per-submap descriptor-cosine stats for a
set of aggregation modes on the discriminating synthetic worlds
(``hard``/``ground`` — data/synthetic.py, tuned so the exact oracle lands
<100% recall@1). This is the instrument VERDICT round-4 items 2/3 ask
for: recall deltas AND the per-submap cosine tail, per world, for the
default stack and its candidates (e.g. the tie-explosion bias
correction), from one shared checkpoint.

Usage:
  python scripts/world_audit.py --log_dir /tmp/r5b/hard_ckpt \
      --worlds hard ground --modes exact max lse lse_tie \
      --json docs/results_round5/world_audit.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ("exact", "max", "lse", "lse_tie", "lse_fused")


def mode_config(mcfg, mode: str):
    """The ModelConfig variant one audit mode evaluates under."""
    if mode == "exact":
        return dataclasses.replace(mcfg, aggregation="max", exact_knn=True)
    if mode == "lse_tie":
        return dataclasses.replace(
            mcfg, aggregation="lse", lse_tie_correction=True
        )
    if mode == "lse_fused":
        return dataclasses.replace(mcfg, aggregation="lse", lse_fused="on")
    return dataclasses.replace(mcfg, aggregation=mode)


def cosine_stats(a, b):
    """Per-submap cosine between two stacked descriptor matrices."""
    num = np.sum(a * b, axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    cos = num / np.maximum(den, 1e-12)
    return {
        "min": float(cos.min()),
        "mean": float(cos.mean()),
        "p1": float(np.percentile(cos, 1.0)),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log_dir", required=True,
                    help="trained checkpoint dir (its config.json sets "
                         "num_points and the base model)")
    ap.add_argument("--worlds", nargs="+", default=["hard", "ground"],
                    choices=["clustered", "hard", "ground"])
    ap.add_argument("--modes", nargs="+",
                    default=["exact", "max", "lse", "lse_tie"],
                    choices=list(MODES))
    ap.add_argument("--baseline_mode", default="max",
                    help="cosine stats are reported vs this mode")
    ap.add_argument("--places", type=int, default=24)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--families", type=int, default=8)
    ap.add_argument("--family_spread", type=float, default=0.12)
    ap.add_argument("--jitter", type=float, default=0.03)
    ap.add_argument("--occlusion", type=float, default=1.2)
    ap.add_argument("--ground_frac", type=float, default=0.6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
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

    cfg = load_config(args.log_dir)
    if cfg is None:
        raise SystemExit(f"no config.json under {args.log_dir}")
    _, state = create_train_state(cfg.model, cfg.train, jax.random.key(0))
    mgr = CheckpointManager(os.path.join(args.log_dir, "checkpoints"))
    state, epoch = mgr.restore(state)
    mgr.close()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"[ckpt] {args.log_dir} epoch {epoch}", flush=True)

    report = {"log_dir": args.log_dir, "epoch": int(epoch), "worlds": {}}
    for world_name in args.worlds:
        world = make_synthetic_dataset(
            num_places=args.places, submaps_per_place=8,
            num_points=cfg.model.num_points, num_runs=args.runs,
            world=world_name, num_families=args.families,
            family_spread=args.family_spread, jitter=args.jitter,
            occlusion=args.occlusion, ground_frac=args.ground_frac,
            seed=args.seed,
        )
        wrep = {}
        vectors = {}
        for mode in args.modes:
            mcfg = mode_config(cfg.model, mode)
            embed = make_embed_fn(build_model(mcfg))
            metrics = evaluate_model(
                embed, variables, world.database_sets, world.query_sets,
                world.loader, batch_size=args.batch, return_vectors=True,
            )
            vectors[mode] = np.concatenate(
                metrics["database_vectors"] + metrics["query_vectors"],
                axis=0,
            )
            wrep[mode] = {
                "recall_at_1": float(metrics["ave_recall"][0]),
                "recall_at_5": float(metrics["ave_recall"][4]),
                "top1pct": float(metrics["ave_one_percent_recall"]),
            }
            print(f"[{world_name}:{mode}] recall@1 "
                  f"{wrep[mode]['recall_at_1']:.2f}  @5 "
                  f"{wrep[mode]['recall_at_5']:.2f}  top1% "
                  f"{wrep[mode]['top1pct']:.2f}", flush=True)
        base = args.baseline_mode
        if base in vectors:
            for mode in args.modes:
                if mode == base:
                    continue
                stats = cosine_stats(vectors[mode], vectors[base])
                wrep[mode][f"cos_vs_{base}"] = stats
                print(f"[{world_name}] cos {mode} vs {base}: "
                      f"min {stats['min']:.4f} p1 {stats['p1']:.4f} "
                      f"mean {stats['mean']:.4f}", flush=True)
        report["worlds"][world_name] = wrep

    print(json.dumps(report))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
