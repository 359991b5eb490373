"""The complete reference workflow on a fabricated Oxford-format dataset:

  CSV run layouts -> generate_queries (training tuples + eval sets)
  -> .bin submaps on disk -> TupleSampler/bin loader -> training
  -> checkpoint -> evaluation from pickles -> recall report.

This is the chain a reference user runs (SURVEY §3.1/§3.2/§3.4) — every
disk artifact in the reference's format, end to end.
"""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from lpdnet_tpu.configs import (
    Config, DataConfig, EvalConfig, MeshConfig, MiningConfig, ModelConfig,
    TrainConfig,
)
from lpdnet_tpu.data.binio import load_pc_file, save_pc_file
from lpdnet_tpu.data.generate_queries import (
    construct_query_and_database_sets,
    generate_training_tuples,
)
from lpdnet_tpu.data.pickles import get_queries_dict, get_sets_dict
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.train.loop import TrainResources, train

N = 48  # points per submap (tiny for CPU)
REGION = [(1000.0, 1000.0)]


def fabricate_oxford(tmp_path, num_runs=2, n_side=6, spacing=30.0, seed=0):
    """Two runs over the same 6x6 grid of 'places'; each grid node gets a
    distinctive clustered cloud (shared base per node, jittered per run)."""
    rng = np.random.RandomState(seed)
    base = str(tmp_path / "benchmark_datasets")
    bases = {}
    for i in range(n_side):
        for j in range(n_side):
            centers = rng.uniform(-0.7, 0.7, (4, 3))
            scales = rng.uniform(0.05, 0.2, (4, 1))
            pts = np.concatenate([
                c + rng.randn(N, 3) * s for c, s in zip(centers, scales)
            ])
            bases[(i, j)] = pts.astype(np.float32)

    for r in range(num_runs):
        run_dir = os.path.join(base, "oxford", f"run{r}")
        os.makedirs(os.path.join(run_dir, "pointcloud_20m_10overlap"),
                    exist_ok=True)
        rows = []
        ts = 0
        for i in range(n_side):
            for j in range(n_side):
                sel = rng.choice(len(bases[(i, j)]), N, replace=False)
                cloud = bases[(i, j)][sel] + rng.randn(N, 3) * 0.01
                save_pc_file(
                    np.clip(cloud, -1, 1),
                    os.path.join(run_dir, "pointcloud_20m_10overlap",
                                 f"{ts}.bin"),
                )
                rows.append({
                    "timestamp": ts,
                    "northing": 900.0 + i * spacing,
                    "easting": 900.0 + j * spacing,
                })
                ts += 1
        pd.DataFrame(rows).to_csv(
            os.path.join(run_dir, "pointcloud_locations_20m_10overlap.csv"),
            index=False,
        )
    return base


@pytest.mark.slow
def test_full_oxford_format_workflow(tmp_path):
    base = fabricate_oxford(tmp_path)
    out_dir = str(tmp_path / "queries")

    # 1. Dataset preparation (reference generating_queries/ stage). The two
    # runs sit on the same grid: cross-run positives at distance 0, within
    # the 10 m radius; negatives beyond 50 m exist at 30 m grid spacing
    # (2+ nodes away).
    outputs = generate_training_tuples(
        base, out_dir, "baseline", regions={"oxford": REGION},
        region_width=75.0,
    )
    db_path, q_path = construct_query_and_database_sets(
        base, "oxford", out_dir, regions=REGION, region_width=75.0,
    )

    train_queries = get_queries_dict(outputs["train"])
    assert len(train_queries) > 0
    eligible = [
        q for q in train_queries.values() if len(q["positives"]) >= 1
    ]
    assert eligible, "grid construction must yield cross-run positives"

    # 2. Training from the generated artifacts (reference train stage).
    def loader(fname):
        return load_pc_file(fname, base, N)

    cfg = Config(
        model=ModelConfig(
            trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
            output_dim=32, graph_k=6, use_input_transform=False,
        ),
        data=DataConfig(dataset_folder=base, num_points=N),
        train=TrainConfig(
            batch_num_queries=4, positives_per_query=1,
            negatives_per_query=4, max_epoch=5, base_learning_rate=2e-3,
            log_dir=str(tmp_path / "log"),
            mining=MiningConfig(warmup_epochs=1, cache_refresh_queries=100),
        ),
        eval=EvalConfig(batch_size=8, top_k=10),
        mesh=MeshConfig(num_devices=4),
    )
    res = TrainResources(
        sampler=TupleSampler(
            train_queries, loader, num_pos=1, num_neg=4
        ),
        loader=loader,
        database_sets=get_sets_dict(db_path),
        query_sets=get_sets_dict(q_path),
    )
    out = train(cfg, res, use_mesh=True)

    # 3. The eval stage consumed the generated eval pickles; same-place
    # submaps differ only by resampling+jitter, so a trained model must
    # retrieve far above chance (1/36 ~ 2.8%; threshold 10x chance — this
    # is a workflow test, not a convergence benchmark).
    recall1 = float(np.asarray(out["eval"]["ave_recall"])[0])
    assert recall1 >= 28.0, out["eval"]
    assert os.path.isfile(tmp_path / "log" / "results.txt")
    assert os.path.isfile(tmp_path / "log" / "checkpoints" / "config.json") or \
        os.path.isfile(tmp_path / "log" / "config.json")
