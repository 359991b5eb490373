#!/usr/bin/env python
"""Train-step batch-axis sweep (VERDICT round-4 item 5).

All prior train-step numbers were at the reference's B=2
(batch_num_queries, 44 submaps/step). This probes whether the 5-scan
share (45% of the step at B=2 — docs/PERF_LOG.md round 4) amortizes
with a larger per-device batch: one process, one TPU init, a JSON line
per B via bench.bench_train_step.

Usage:
  python scripts/bench_train_batch.py --batches 2 4 8 16 \
      --json docs/results_round5/train_batch_sweep.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench

    rows = []
    for b in args.batches:
        try:
            qps, sps, mfu = bench.bench_train_step(
                batch_queries=b, iters=args.iters
            )
        except Exception as e:  # e.g. HBM OOM at large B — record, move on
            rows.append({
                "batch_num_queries": b,
                "submaps_per_step": 22 * b,
                "error": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}",
            })
            print(json.dumps(rows[-1]), flush=True)
            continue
        rows.append({
            "batch_num_queries": b,
            "submaps_per_step": 22 * b,
            "queries_per_sec": qps,
            "submaps_per_sec": sps,
            "mfu": mfu,
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
