"""Determinism: identical seeds reproduce identical training trajectories
(the deterministic (seed, epoch) data order + pure-functional step)."""

import json

import numpy as np
import pytest

from lpdnet_tpu.configs import (
    Config, DataConfig, EvalConfig, MeshConfig, ModelConfig, TrainConfig,
)
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.train.loop import TrainResources, train

N = 64


def _run(tmp_path, tag, seed):
    ds = make_synthetic_dataset(num_places=5, submaps_per_place=4, num_points=N)
    cfg = Config(
        model=ModelConfig(
            trunk="pointnetvlad", num_points=N, feature_dim=64,
            num_clusters=8, output_dim=32, use_input_transform=False,
        ),
        data=DataConfig(num_points=N),
        train=TrainConfig(
            batch_num_queries=4, positives_per_query=2, negatives_per_query=4,
            max_epoch=2, seed=seed, log_dir=str(tmp_path / tag),
        ),
        eval=EvalConfig(batch_size=8),
        mesh=MeshConfig(num_devices=2),
    )
    res = TrainResources(
        sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
        loader=ds.loader,
    )
    train(cfg, res, use_mesh=False)
    with open(tmp_path / tag / "metrics.jsonl") as f:
        return [
            json.loads(line)["loss"]
            for line in f
            if json.loads(line)["event"] == "epoch"
        ]


def test_same_seed_same_trajectory(tmp_path):
    a = _run(tmp_path, "a", seed=7)
    b = _run(tmp_path, "b", seed=7)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


@pytest.mark.slow
def test_different_seed_different_trajectory(tmp_path):
    a = _run(tmp_path, "c", seed=7)
    b = _run(tmp_path, "d", seed=8)
    assert not np.allclose(a, b)
