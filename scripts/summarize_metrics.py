#!/usr/bin/env python
"""Summarize a training run's metrics.jsonl (SURVEY §5 observability row).

Usage: python scripts/summarize_metrics.py log/metrics.jsonl
"""

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "log/metrics.jsonl"
    epochs = {}
    evals = {}
    vals = {}
    best = None
    other = defaultdict(int)
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r["event"] == "epoch":
                epochs[r["epoch"]] = r
            elif r["event"] == "eval":
                evals[r["epoch"]] = r
            elif r["event"] == "val":
                vals[r["epoch"]] = r
            elif r["event"] == "best_checkpoint":
                best = r
                other[r["event"]] += 1
            else:
                other[r["event"]] += 1

    print(f"{'epoch':>5} {'loss':>10} {'val_loss':>10} {'steps':>6} "
          f"{'recall@1':>9} {'recall@1%':>10}")
    for ep in sorted(epochs):
        e = epochs[ep]
        v = evals.get(ep, {})
        vl = vals.get(ep, {}).get("loss")
        r1 = v.get("recall_at_1")
        rp = v.get("one_percent_recall")
        print(
            f"{ep:>5} {e['loss']:>10.4f} "
            f"{('%.4f' % vl) if vl is not None else '-':>10} "
            f"{e['steps']:>6} "
            f"{('%.2f' % r1) if r1 is not None else '-':>9} "
            f"{('%.2f' % rp) if rp is not None else '-':>10}"
        )
    if best is not None:
        print(
            f"best checkpoint: epoch {best['epoch']} step {best['step']} "
            f"recall@1% {best['one_percent_recall']:.2f}"
        )
    if other:
        print("other events:", dict(other))


if __name__ == "__main__":
    main()
