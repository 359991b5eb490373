#!/usr/bin/env python
"""Summarize a jax.profiler trace directory: top device ops by total time.

The profiling workflow (SURVEY §5 tracing row; method in docs/PERF_LOG.md):

  python bench.py --trace /tmp/tr          # or any jax.profiler.start_trace
  python scripts/trace_summary.py /tmp/tr [--top 30] [--iters N]

Aggregates the duration of every complete event across the trace's
``*.trace.json.gz`` shards. With ``--iters`` the totals are divided so the
numbers read as ms/iteration. Kernel names carry XLA's op numbering
(``fusion.288``, ``while.66``, ``edge_max_gather.3`` — Pallas kernels keep
their python name); attribute them to source ops via
``jit(f).lower(...).compile().as_text()`` metadata when needed.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

# Host-side bookkeeping rows that swamp the device signal.
_NOISE_PREFIXES = (
    "$", "np.asarray", "PjitFunction", "program_interpreter",
)


def summarize(trace_dir: str, top: int = 30, iters: int = 1):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    totals: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for f in files:
        tr = json.load(gzip.open(f))
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                name = e["name"]
                if name.startswith(_NOISE_PREFIXES) or name.isdigit():
                    continue
                totals[name] += e["dur"]
                counts[name] += 1
    rows = totals.most_common(top)
    width = max((len(n) for n, _ in rows), default=4)
    print(f"{'ms/iter':>10}  {'calls':>6}  op")
    for name, dur in rows:
        print(
            f"{dur / 1e3 / iters:10.3f}  {counts[name]:6d}  "
            f"{name[:width + 20]}"
        )
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--iters", type=int, default=1,
        help="iterations traced; durations are divided by this",
    )
    args = ap.parse_args()
    summarize(args.trace_dir, args.top, args.iters)


if __name__ == "__main__":
    main()
