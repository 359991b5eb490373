"""Subprocess tests of the root CLIs (VERDICT round 1, item 9): the
argparse surfaces of train.py / evaluate.py — preset/override wiring,
--resume, checkpoint layout, results-file format — had no test driving them
as actual processes; a wiring regression would ship invisible.

Runs on the 8-virtual-CPU fleet (env inherited from conftest) at tiny dims.
"""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --no_mesh: the 8-virtual-device compile costs ~3x single-device on CPU
# and mesh sharding is covered by test_parallel.py; this suite tests the
# argparse/config/artifact wiring.
COMMON = [
    "--synthetic", "--num_points", "64",
    "--negatives_per_query", "4", "--no_mesh",
]


def run_cli(script, *args, timeout=600):
    proc = subprocess.run(
        [sys.executable, script, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    return proc


@pytest.mark.slow
def test_train_evaluate_resume_cli_roundtrip(tmp_path):
    log_dir = str(tmp_path / "log")

    # 1. Train 1 epoch from scratch.
    out = run_cli("train.py", *COMMON, "--log_dir", log_dir,
                  "--max_epoch", "1")
    assert "final ave recall@1%" in out.stdout

    # Checkpoint + config + metrics artifacts on disk.
    assert os.path.isdir(os.path.join(log_dir, "checkpoints"))
    assert os.path.isfile(os.path.join(log_dir, "config.json"))
    metrics = [
        json.loads(line)
        for line in open(os.path.join(log_dir, "metrics.jsonl"))
    ]
    epochs = [m for m in metrics if m["event"] == "epoch"]
    assert [m["epoch"] for m in epochs] == [0]
    cfg = json.load(open(os.path.join(log_dir, "config.json")))
    assert cfg["model"]["num_points"] == 64  # --num_points wired through

    # Results file in the reference text format.
    results = open(os.path.join(log_dir, "results.txt")).read()
    assert "Average Recall @N:" in results
    assert "Average Top 1% Recall:" in results

    # 2. Resume for one more epoch: must continue at epoch 1, not restart.
    run_cli("train.py", *COMMON, "--log_dir", log_dir,
            "--max_epoch", "2", "--resume")
    metrics = [
        json.loads(line)
        for line in open(os.path.join(log_dir, "metrics.jsonl"))
    ]
    assert any(m["event"] == "resume" for m in metrics)
    epochs = [m["epoch"] for m in metrics if m["event"] == "epoch"]
    assert epochs == [0, 1]

    # 3. evaluate.py restores the checkpoint (auto-loading config.json) and
    # prints the reference-format report.
    out = run_cli("evaluate.py", "--synthetic", "--log_dir", log_dir)
    assert "restored checkpoint from epoch 1" in out.stdout
    assert "Average Top 1% Recall:" in out.stdout
    m = re.search(
        r"Average Top 1% Recall:\s*([\d.]+)", out.stdout
    )
    assert m and 0.0 <= float(m.group(1)) <= 100.0
