"""Refined-stage end-to-end through the real CLI path (VERDICT round-2
item 8, BASELINE config 5): a fabricated 4-dataset world (oxford +
university + residential + business, each in its reference disk layout) ->
``generate_queries --mode refine`` (CLI) -> ``train.py --preset refine``
(subprocess) -> ``evaluate.py --all_sets`` (subprocess) -> all four
``<set>_results.txt`` reports.
"""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from lpdnet_tpu.data.binio import save_pc_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 48
US_SETS = ["university", "residential", "business"]


def run_cli(*args, timeout=900):
    proc = subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    return proc


def fabricate_world(tmp_path, n_side=4, spacing=30.0, seed=0):
    """Every dataset in its reference layout (generate_queries
    DATASET_LAYOUTS): oxford runs use the 20m_10overlap names, the U.S.
    sets the centroids_25 names. Two runs each over a shared place grid
    (cross-run positives at distance 0)."""
    rng = np.random.RandomState(seed)
    base = str(tmp_path / "benchmark_datasets")
    layouts = {
        "oxford": ("pointcloud_locations_20m_10overlap.csv",
                   "pointcloud_20m_10overlap"),
        **{ds: ("pointcloud_centroids_25.csv", "pointcloud_25m_25")
           for ds in US_SETS},
    }
    for d_i, (ds, (csv_name, pc_dir)) in enumerate(layouts.items()):
        bases = {}
        for i in range(n_side):
            for j in range(n_side):
                centers = rng.uniform(-0.7, 0.7, (4, 3))
                pts = np.concatenate(
                    [c + rng.randn(N, 3) * 0.1 for c in centers]
                )
                bases[(i, j)] = pts.astype(np.float32)
        for r in range(2):
            run_dir = os.path.join(base, ds, f"run{r}")
            os.makedirs(os.path.join(run_dir, pc_dir), exist_ok=True)
            rows, ts = [], 0
            for i in range(n_side):
                for j in range(n_side):
                    sel = rng.choice(len(bases[(i, j)]), N, replace=False)
                    cloud = bases[(i, j)][sel] + rng.randn(N, 3) * 0.01
                    save_pc_file(
                        np.clip(cloud, -1, 1),
                        os.path.join(run_dir, pc_dir, f"{ts}.bin"),
                    )
                    rows.append({
                        "timestamp": ts,
                        # Distinct UTM neighborhoods per dataset.
                        "northing": 900.0 + 10_000.0 * d_i + i * spacing,
                        "easting": 900.0 + 10_000.0 * d_i + j * spacing,
                    })
                    ts += 1
            pd.DataFrame(rows).to_csv(
                os.path.join(run_dir, csv_name), index=False
            )
    return base


@pytest.mark.slow
def test_refine_stage_end_to_end(tmp_path):
    base = fabricate_world(tmp_path)
    log_dir = str(tmp_path / "log")

    # Region file: one oxford test rectangle (the U.S. sets train whole,
    # per the reference refine semantics).
    regions = str(tmp_path / "regions.json")
    with open(regions, "w") as f:
        f.write('{"oxford": [[1000.0, 1000.0]]}')

    # 1. Dataset prep CLI: refine tuples + all four eval-set pickles.
    out = run_cli(
        "-m", "lpdnet_tpu.data.generate_queries",
        "--dataset_folder", base, "--out_dir", base, "--mode", "refine",
        "--regions_json", regions, "--region_width", "75.0",
    )
    assert "training_queries_refine.pickle" in out.stdout
    run_cli(
        "-m", "lpdnet_tpu.data.generate_queries",
        "--dataset_folder", base, "--out_dir", base, "--mode", "test_sets",
        "--datasets", "oxford", *US_SETS,
        "--regions_json", regions, "--region_width", "75.0",
    )
    for ds in ["oxford", *US_SETS]:
        assert os.path.isfile(
            os.path.join(base, f"{ds}_evaluation_database.pickle")
        )

    # 2. Refined training via the real CLI (tiny dims through --set).
    tiny = [
        "--set", "model.feature_dim=64",
        "--set", "model.num_clusters=8",
        "--set", "model.output_dim=32",
        "--set", "model.graph_k=6",
        "--set", "model.features.k=6",
        "--set", "model.features.knn_block=64",
        "--set", "train.mining.warmup_epochs=1",
        "--set", "train.mining.cache_refresh_queries=200",
        "--set", "train.mining.hard_negatives_per_query=2",
        "--set", "eval.batch_size=8",
        "--set", "train.base_learning_rate=0.002",
    ]
    run_cli(
        "train.py", "--preset", "refine", "--trunk", "lpdnet",
        "--dataset_folder", base, "--train_file",
        os.path.join(base, "training_queries_refine.pickle"),
        "--log_dir", log_dir, "--max_epoch", "2", "--num_points", str(N),
        "--batch_num_queries", "4", "--positives_per_query", "1",
        "--negatives_per_query", "4", "--no_mesh", *tiny,
    )
    assert os.path.isdir(os.path.join(log_dir, "checkpoints"))

    # 3. Four-set evaluation via the real CLI (config auto-loads from the
    # log dir, so the tiny dims carry over).
    out = run_cli(
        "evaluate.py", "--all_sets", "--dataset_folder", base,
        "--log_dir", log_dir, "--no_mesh",
    )
    for ds in ["oxford", *US_SETS]:
        assert f"=== {ds} ===" in out.stdout
        report = os.path.join(log_dir, f"{ds}_results.txt")
        assert os.path.isfile(report), report
        text = open(report).read()
        assert "Average Recall @N:" in text
        assert "Average Top 1% Recall:" in text
