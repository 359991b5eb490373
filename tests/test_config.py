"""Config tree: presets, dotted-path overrides, JSON round-trip."""

import dataclasses

from lpdnet_tpu.configs import (
    Config, PRESETS, apply_overrides, lpd_baseline_config, refine_config,
)
from lpdnet_tpu.utils.checkpoint import load_config, save_config


def test_presets():
    assert PRESETS["baseline"]().model.trunk == "pointnetvlad"
    assert lpd_baseline_config().model.trunk == "lpdnet"
    r = refine_config()
    assert r.data.train_file == "training_queries_refine.pickle"
    assert r.model.trunk == "lpdnet"


def test_reference_constants():
    cfg = Config()
    # SURVEY C1 constants.
    assert cfg.model.num_points == 4096
    assert cfg.model.output_dim == 256
    assert cfg.train.batch_num_queries == 2
    assert cfg.train.positives_per_query == 2
    assert cfg.train.negatives_per_query == 18
    assert cfg.train.loss.margin_1 == 0.5
    assert cfg.train.loss.margin_2 == 0.2
    assert cfg.train.tuples_per_batch == 22


def test_apply_overrides_nested():
    cfg = Config()
    cfg2 = apply_overrides(
        cfg,
        **{
            "model.trunk": "lpdnet",
            "train.loss.margin_1": 0.7,
            "train.mining.warmup_epochs": 3,
        },
    )
    assert cfg2.model.trunk == "lpdnet"
    assert cfg2.train.loss.margin_1 == 0.7
    assert cfg2.train.mining.warmup_epochs == 3
    # Original untouched (frozen dataclasses).
    assert cfg.model.trunk == "pointnetvlad"


def test_config_json_roundtrip(tmp_path):
    cfg = apply_overrides(
        refine_config(),
        **{"model.compute_dtype": "bfloat16", "model.graph_k": 16},
    )
    save_config(cfg, str(tmp_path))
    back = load_config(str(tmp_path))
    assert back == cfg


def test_load_config_missing(tmp_path):
    assert load_config(str(tmp_path / "nope")) is None
