"""Smoke tests for the analysis scripts (summarize/trace tooling)."""

import gzip
import json
import os
import subprocess
import sys

import pytest

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


@pytest.mark.slow
def test_run_oxford_runbook_smoke(tmp_path):
    """scripts/run_oxford.sh end-to-end on the fabricated 4-dataset world:
    all five stages (tuple gen, baseline train+eval, refined train,
    4-set eval, exact-kNN audit) at tiny dims via the env-arg hooks —
    guards the runbook's flag wiring against CLI drift."""
    from tests.test_refine_e2e import fabricate_world

    base = fabricate_world(tmp_path)
    out_dir = str(tmp_path / "runs")
    regions = str(tmp_path / "regions.json")
    with open(regions, "w") as f:
        f.write('{"oxford": [[1000.0, 1000.0]]}')

    tiny_set = []
    for kv in [
        "model.feature_dim=64", "model.num_clusters=8",
        "model.output_dim=32", "model.graph_k=6", "model.features.k=6",
        "model.features.knn_block=64", "train.mining.warmup_epochs=1",
        "eval.batch_size=8",
    ]:
        tiny_set += ["--set", kv]
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "GEN_ARGS": f"--regions_json {regions} --region_width 75.0",
        "TRAIN_ARGS": " ".join([
            "--max_epoch", "1", "--num_points", "48",
            "--batch_num_queries", "4", "--positives_per_query", "1",
            "--negatives_per_query", "4", "--no_mesh", *tiny_set,
        ]),
        "EVAL_ARGS": "--no_mesh",
    })
    proc = subprocess.run(
        ["bash", "scripts/run_oxford.sh", base, out_dir],
        cwd=REPO, capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    # Stage artifacts: pickles in the dataset folder, reports per log dir.
    assert os.path.isfile(os.path.join(base, "training_queries_refine.pickle"))
    assert os.path.isfile(os.path.join(out_dir, "log_baseline", "results.txt"))
    for ds in ["oxford", "university", "residential", "business"]:
        assert os.path.isfile(
            os.path.join(out_dir, "log_refine", f"{ds}_results.txt")
        ), ds
    assert os.path.isfile(
        os.path.join(out_dir, "log_refine", "results_exact.txt")
    )
