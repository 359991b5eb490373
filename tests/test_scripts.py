"""Smoke tests for the analysis scripts (summarize/trace tooling)."""

import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_trace_summary_aggregates_device_events(tmp_path):
    trace = {
        "traceEvents": [
            {"ph": "X", "name": "fusion.1", "dur": 1000},
            {"ph": "X", "name": "fusion.1", "dur": 2000},
            {"ph": "X", "name": "edge_max_gather.2", "dur": 5000},
            {"ph": "X", "name": "$numpy asarray", "dur": 9999999},  # noise
            {"ph": "X", "name": "42", "dur": 9999999},  # per-iter row noise
            {"ph": "M", "name": "meta-only"},
        ]
    }
    d = tmp_path / "plugins" / "profile"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    proc = subprocess.run(
        [sys.executable, "scripts/trace_summary.py", str(tmp_path),
         "--iters", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "edge_max_gather.2" in out and "fusion.1" in out
    assert "$numpy" not in out and " 42" not in out
    # 5000 us / 2 iters = 2.5 ms/iter leads the table.
    first = out.splitlines()[1]
    assert "2.500" in first and "edge_max_gather.2" in first
