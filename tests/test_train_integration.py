"""End-to-end integration: the jitted train step learns the synthetic
clustered dataset to recall@1 = 100% (SURVEY §4), mining + checkpoint
round-trip, and loss decreases."""

import dataclasses

import numpy as np
import jax
import pytest

from lpdnet_tpu.configs import (
    Config, DataConfig, EvalConfig, FeatureConfig, LossConfig, MeshConfig,
    MiningConfig, ModelConfig, TrainConfig,
)
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.eval.evaluate import evaluate_model, format_results
from lpdnet_tpu.train.loop import TrainResources, train
from lpdnet_tpu.train.mining import DescriptorCache
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import make_embed_fn, make_train_step
from lpdnet_tpu.utils.logging import MetricsLogger

N = 64


def tiny_config(tmp_path, trunk="pointnetvlad", epochs=3, warmup=1):
    return Config(
        model=ModelConfig(
            trunk=trunk, num_points=N, feature_dim=64, num_clusters=8,
            output_dim=32, graph_k=6, use_input_transform=False,
            features=FeatureConfig(k=6, knn_block=64),
        ),
        data=DataConfig(num_points=N, augment_rotate=True, augment_jitter=True),
        train=TrainConfig(
            batch_num_queries=4, positives_per_query=2, negatives_per_query=4,
            max_epoch=epochs, base_learning_rate=2e-3,
            log_dir=str(tmp_path / "log"),
            loss=LossConfig(lazy=True),
            mining=MiningConfig(
                warmup_epochs=warmup, hard_negatives_per_query=2,
                cache_refresh_queries=100,
            ),
        ),
        eval=EvalConfig(batch_size=8, top_k=5),
        mesh=MeshConfig(num_devices=4),
    )


@pytest.fixture(scope="module")
def dataset():
    return make_synthetic_dataset(
        num_places=8, submaps_per_place=6, num_points=N, seed=0
    )


def test_train_step_decreases_loss(dataset):
    config = Config(
        model=ModelConfig(
            trunk="pointnetvlad", num_points=N, feature_dim=64,
            num_clusters=8, output_dim=32, use_input_transform=False,
        ),
        train=TrainConfig(
            batch_num_queries=4, positives_per_query=2, negatives_per_query=4,
            base_learning_rate=2e-3,
        ),
    )
    model, state = create_train_state(
        config.model, config.train, jax.random.key(0)
    )
    step = make_train_step(model, config.train.loss)
    sampler = TupleSampler(dataset.queries, dataset.loader, num_pos=2, num_neg=4)
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(6):
        for ids, batch in sampler.epoch_batches(4, rng):
            state, loss = step(state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_full_training_loop_reaches_perfect_recall(dataset, tmp_path):
    cfg = tiny_config(tmp_path, epochs=14, warmup=2)
    held_out = TupleSampler(
        dataset.queries, dataset.loader,
        num_pos=cfg.train.positives_per_query,
        num_neg=cfg.train.negatives_per_query,
    )
    res = TrainResources(
        sampler=TupleSampler(
            dataset.queries, dataset.loader,
            num_pos=cfg.train.positives_per_query,
            num_neg=cfg.train.negatives_per_query,
        ),
        loader=dataset.loader,
        database_sets=dataset.database_sets,
        query_sets=dataset.query_sets,
        val_sampler=held_out,
    )
    out = train(cfg, res, use_mesh=True)
    recall = np.asarray(out["eval"]["ave_recall"])
    # Synthetic places are well separated: top-1 recall must hit 100%.
    assert recall[0] == 100.0, recall
    assert out["eval"]["ave_one_percent_recall"] == 100.0
    # Results file got written in the reference's format.
    text = (tmp_path / "log" / "results.txt").read_text()
    assert "Average Top 1% Recall" in text
    # ... with its machine-readable JSONL twin (SURVEY §5 metrics row).
    import json as _json
    twin = (tmp_path / "log" / "results.txt.jsonl").read_text().splitlines()
    rec = _json.loads(twin[-1])
    assert rec["ave_one_percent_recall"] == 100.0
    assert rec["ave_recall"][0] == 100.0
    # Per-epoch validation loss over the held-out tuples (reference
    # TEST_FILE — SURVEY C15): logged every epoch, finite, and lower at
    # the end than at the start (the model generalizes to unaugmented
    # tuples from the same world).
    vals = [
        _json.loads(l)
        for l in (tmp_path / "log" / "metrics.jsonl").read_text().splitlines()
    ]
    vlosses = [r["loss"] for r in vals if r["event"] == "val"]
    assert len(vlosses) == cfg.train.max_epoch
    assert all(np.isfinite(v) for v in vlosses)
    assert vlosses[-1] < vlosses[0]
    # Best-by-eval checkpoint (reference C17 keeps a best copy): saved,
    # with the best recall riding its sidecar for resume comparisons.
    from lpdnet_tpu.utils.checkpoint import CheckpointManager
    best = CheckpointManager(str(tmp_path / "log" / "checkpoints_best"))
    bk = best.latest_key()
    assert bk is not None
    bx = best.load_extra(bk)
    assert bx is not None and float(bx["best_recall"]) == 100.0
    best.close()


@pytest.mark.slow
def test_lpd_training_loop_learns(dataset, tmp_path):
    """The LPD trunk (on-device features + dual graph) must also learn the
    synthetic places — guards feature-scale regressions (raw density once
    drowned the other features and capped recall at ~20%)."""
    cfg = tiny_config(tmp_path, trunk="lpdnet", epochs=6, warmup=2)
    res = TrainResources(
        sampler=TupleSampler(
            dataset.queries, dataset.loader,
            num_pos=cfg.train.positives_per_query,
            num_neg=cfg.train.negatives_per_query,
        ),
        loader=dataset.loader,
        database_sets=dataset.database_sets,
        query_sets=dataset.query_sets,
    )
    out = train(cfg, res, use_mesh=False)
    assert out["eval"]["ave_one_percent_recall"] >= 75.0, out["eval"]


def test_mining_cache_and_hard_negatives(dataset):
    cfg_m = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, use_input_transform=False,
    )
    model, state = create_train_state(cfg_m, TrainConfig(), jax.random.key(0))
    sampler = TupleSampler(dataset.queries, dataset.loader, num_pos=2, num_neg=4)
    embed = make_embed_fn(model)
    cache = DescriptorCache(sampler, batch_size=8)
    vecs = cache.refresh(
        embed, {"params": state.params, "batch_stats": state.batch_stats}
    )
    assert vecs.shape == (len(sampler.all_indices), 32)
    rng = np.random.RandomState(0)
    hard = cache.hard_negatives(0, 3, rng)
    assert len(hard) == 3
    negs = set(dataset.queries[0]["negatives"])
    assert all(h in negs for h in hard)
    # Hard negatives are the closest in descriptor space among negatives.
    qv = vecs[cache.row_of[0]]
    d = {n: ((vecs[cache.row_of[n]] - qv) ** 2).sum() for n in negs}
    best = sorted(negs, key=lambda n: d[n])[:3]
    assert set(hard) == set(best)


def test_checkpoint_resume_roundtrip(dataset, tmp_path):
    cfg = tiny_config(tmp_path, epochs=2, warmup=99)
    res = TrainResources(
        sampler=TupleSampler(
            dataset.queries, dataset.loader,
            num_pos=cfg.train.positives_per_query,
            num_neg=cfg.train.negatives_per_query,
        ),
        loader=dataset.loader,
    )
    out1 = train(cfg, res, use_mesh=False)
    # Resume for 1 more epoch from the saved checkpoint.
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_epoch=3, resume=True)
    )
    out2 = train(cfg2, res, use_mesh=False)
    s1 = out1["state"]
    s2 = out2["state"]
    assert int(s2.step) > int(s1.step)


@pytest.mark.slow
def test_checkpoint_interchange_max_lse(dataset, tmp_path):
    """Aggregation modes share parameters (models/lpdnet.py EdgeConv:
    agg_fn changes the compute, not the param tree), so checkpoints are
    interchangeable: train under 'max', read the SAME checkpoint back
    under 'lse' — descriptors must agree, and training must resume and
    continue under 'lse' (VERDICT round-3 item 6)."""
    import jax.numpy as jnp

    from lpdnet_tpu.models.model import build_model

    cfg = tiny_config(tmp_path, trunk="lpdnet", epochs=2, warmup=99)
    res = TrainResources(
        sampler=TupleSampler(
            dataset.queries, dataset.loader,
            num_pos=cfg.train.positives_per_query,
            num_neg=cfg.train.negatives_per_query,
        ),
        loader=dataset.loader,
    )
    out1 = train(cfg, res, use_mesh=False)
    variables = {
        "params": out1["state"].params,
        "batch_stats": out1["state"].batch_stats,
    }
    pts = jnp.asarray(
        np.stack([dataset.loader(dataset.queries[i]["query"]) for i in range(8)])
    )
    d_max = np.asarray(build_model(cfg.model).apply(variables, pts, train=False))
    d_lse = np.asarray(
        build_model(
            dataclasses.replace(cfg.model, aggregation="lse")
        ).apply(variables, pts, train=False)
    )
    cos = np.sum(d_max * d_lse, -1)  # both L2-normalized
    assert cos.min() > 0.97, cos

    # Resume the max-trained checkpoint under 'lse' and keep training.
    cfg2 = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, aggregation="lse"),
        train=dataclasses.replace(cfg.train, max_epoch=3, resume=True),
    )
    out2 = train(cfg2, res, use_mesh=False)
    assert int(out2["state"].step) > int(out1["state"].step)
    d_resumed = np.asarray(
        build_model(cfg2.model).apply(
            {
                "params": out2["state"].params,
                "batch_stats": out2["state"].batch_stats,
            },
            pts, train=False,
        )
    )
    assert np.all(np.isfinite(d_resumed))
