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


def test_load_config_pre_knn_window_pins_exact(tmp_path):
    """config.json files saved before ModelConfig.knn_window existed must
    restore with the exact full-scan semantics they were trained with, not
    the current approximate default (ADVICE round 2)."""
    import json

    import pytest

    cfg = Config()
    save_config(cfg, str(tmp_path))
    path = tmp_path / "config.json"
    raw = json.loads(path.read_text())
    del raw["model"]["knn_window"]
    path.write_text(json.dumps(raw))
    with pytest.warns(UserWarning, match="knn_window"):
        back = load_config(str(tmp_path))
    assert back.model.knn_window is None


def test_resolve_transfer_dtype_auto():
    from lpdnet_tpu.configs import resolve_transfer_dtype

    assert resolve_transfer_dtype("auto", True) == "int16"
    assert resolve_transfer_dtype("auto", False) == "float32"
    # Explicit settings pass through untouched.
    assert resolve_transfer_dtype("float16", False) == "float16"
    assert resolve_transfer_dtype("float32", True) == "float32"


def test_parse_override_value():
    from lpdnet_tpu.configs import parse_override_value

    assert parse_override_value("256") == 256
    assert parse_override_value("0.7") == 0.7
    assert parse_override_value("true") is True
    assert parse_override_value("null") is None
    assert parse_override_value("lpdnet") == "lpdnet"
    assert parse_override_value('"quoted"') == "quoted"


def test_aggregation_validation():
    """aggregation='lse' on the aggregation-free PointNet trunk must fail
    loud (a silently-ignored flag let a vacuous LSE "verification" train
    the baseline trunk), as must unknown aggregation values."""
    import pytest

    from lpdnet_tpu.configs import ModelConfig

    ModelConfig(trunk="lpdnet", aggregation="lse")  # fine
    with pytest.raises(ValueError, match="LPD-trunk"):
        ModelConfig(trunk="pointnetvlad", aggregation="lse")
    with pytest.raises(ValueError, match="aggregation"):
        ModelConfig(trunk="lpdnet", aggregation="softmax")
    # Explicit lse + per-edge BN must fail at CONFIG time, not trace time
    # (advisor round-4): LSE never materializes the (B, N, k, C) edge
    # tensor the 'edge' placement normalizes. 'auto' resolves to 'max'.
    with pytest.raises(ValueError, match="edge_bn_placement"):
        ModelConfig(trunk="lpdnet", aggregation="lse", edge_bn_placement="edge")
    assert ModelConfig(
        trunk="lpdnet", edge_bn_placement="edge"
    ).resolved_aggregation == "max"


def test_resolved_aggregation_auto_rules():
    """'auto' (the round-4 default) resolves at READ time: lse for the
    LPD trunk, max for aggregation-free trunks and for the torch-parity
    'edge' BN placement; explicit values always win; and because the
    resolution is read-time, dataclasses.replace(trunk=...) keeps the
    right default (a construction-time rewrite froze the OLD trunk's
    choice — the preset/--trunk path)."""
    import dataclasses

    from lpdnet_tpu.configs import ModelConfig, PRESETS

    assert ModelConfig().aggregation == "auto"
    assert ModelConfig().resolved_aggregation == "max"  # pointnetvlad
    assert ModelConfig(trunk="lpdnet").resolved_aggregation == "lse"
    assert ModelConfig(
        trunk="lpdnet", edge_bn_placement="edge"
    ).resolved_aggregation == "max"
    assert ModelConfig(
        trunk="lpdnet", aggregation="max"
    ).resolved_aggregation == "max"

    base = ModelConfig()  # auto, resolves max
    flipped = dataclasses.replace(base, trunk="lpdnet")
    assert flipped.resolved_aggregation == "lse"

    assert PRESETS["lpd_baseline"]().model.resolved_aggregation == "lse"
    assert PRESETS["baseline"]().model.resolved_aggregation == "max"
