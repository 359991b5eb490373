#!/usr/bin/env python
"""Offline metrics.jsonl -> tensorboard bridge (SURVEY C19: the reference
logs train-loss scalars via tensorboardX SummaryWriter; our primary sink is
diffable JSONL — this converts an existing run for tensorboard viewing).

Usage:
  python scripts/export_tensorboard.py log/metrics.jsonl [--out log/tb]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpdnet_tpu.utils.logging import _scalar_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("metrics", help="path to metrics.jsonl")
    ap.add_argument("--out", default=None,
                    help="event-file directory (default: <run dir>/tb)")
    args = ap.parse_args()

    from tensorboardX import SummaryWriter

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.metrics)), "tb"
    )
    writer = SummaryWriter(out)
    n_scalars = 0
    with open(args.metrics) as f:
        for i, line in enumerate(f):
            rec = json.loads(line)
            event = rec.pop("event")
            rec.pop("time", None)
            step = _scalar_step(rec, i)
            for k, v in rec.items():
                if k not in ("step", "epoch") and isinstance(v, (int, float)):
                    writer.add_scalar(f"{event}/{k}", v, step)
                    n_scalars += 1
    writer.close()
    print(f"wrote {n_scalars} scalars to {out}")


if __name__ == "__main__":
    main()
