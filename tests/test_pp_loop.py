"""Pipeline parallelism through the TRAINING LOOP (MeshConfig.pipeline_stages
/ train.py --pp_stages): the pipelined step + sweeps run under the full epoch
driver (mining, eval, Orbax checkpoints), checkpoints stay in the standard
payload (stage stacks convert losslessly — parallel/pp.py), and resume is
exact. Complements tests/test_pp.py, which validates the schedule math
against the monolithic forward."""

import dataclasses

import numpy as np
import pytest

import jax

from lpdnet_tpu.configs import (
    Config, DataConfig, EvalConfig, FeatureConfig, MeshConfig, MiningConfig,
    ModelConfig, TrainConfig,
)
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.train.loop import TrainResources, train

N = 64


def make_cfg(log_dir, pp_stages=2, resume=False, max_epoch=2):
    return Config(
        model=ModelConfig(
            trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
            output_dim=32, graph_k=6, features=FeatureConfig(k=6, knn_block=64),
        ),
        data=DataConfig(num_points=N),
        train=TrainConfig(
            batch_num_queries=2, positives_per_query=2,
            negatives_per_query=4, max_epoch=max_epoch,
            base_learning_rate=1e-3, log_dir=str(log_dir), resume=resume,
            eval_every_epochs=2, checkpoint_every_epochs=1,
            mining=MiningConfig(
                warmup_epochs=1, hard_negatives_per_query=2,
                cache_refresh_queries=10_000, sampled_negatives=8,
            ),
        ),
        eval=EvalConfig(batch_size=8, top_k=5),
        mesh=MeshConfig(pipeline_stages=pp_stages),
    )


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(
        num_places=6, submaps_per_place=4, num_points=N, seed=0
    )


def resources(ds):
    return TrainResources(
        sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
        loader=ds.loader,
        database_sets=ds.database_sets,
        query_sets=ds.query_sets,
    )


def leaves(state):
    return [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(
            {"p": state.params, "s": state.batch_stats, "o": state.opt_state}
        )
    ]


@pytest.mark.slow
def test_pp_loop_trains_and_resumes_exactly(tmp_path, ds):
    # A: uninterrupted 2-epoch pipelined run.
    out_a = train(make_cfg(tmp_path / "a"), resources(ds))
    state_a = out_a["state"]
    assert int(state_a.step) > 0
    for leaf in leaves(state_a):
        assert np.isfinite(leaf).all()

    # B: stop after epoch 0, resume to epoch 2 -> exactly A's final state
    # (checkpoints round-trip through the standard payload; stacking is
    # lossless, randomness is keyed by (seed, epoch, batch)).
    train(make_cfg(tmp_path / "b", max_epoch=1), resources(ds))
    out_b = train(
        make_cfg(tmp_path / "b", max_epoch=2, resume=True), resources(ds)
    )
    assert int(out_b["state"].step) == int(state_a.step)
    for a, b in zip(leaves(state_a), leaves(out_b["state"])):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


@pytest.mark.slow
def test_pp_checkpoint_cross_topology(tmp_path, ds):
    """A pipelined run's checkpoint resumes on the monolithic path and
    vice versa — the standard payload is topology-free. (The monolithic
    legs run use_mesh=False so both topologies carry the same global
    batch; the meshed DP path would scale it per device.)"""
    # PP epoch 0 -> monolithic epoch 1.
    d = tmp_path / "pp_to_mono"
    out1 = train(make_cfg(d, pp_stages=2, max_epoch=1), resources(ds))
    step1 = int(out1["state"].step)
    assert step1 > 0
    cfg = make_cfg(d, pp_stages=0, max_epoch=2, resume=True)
    out = train(cfg, resources(ds), use_mesh=False)
    assert int(out["state"].step) == 2 * step1

    # Monolithic epoch 0 -> PP epochs 1..2 (4 stages this time).
    d = tmp_path / "mono_to_pp"
    out1 = train(
        make_cfg(d, pp_stages=0, max_epoch=1), resources(ds),
        use_mesh=False,
    )
    step1 = int(out1["state"].step)
    out = train(
        make_cfg(d, pp_stages=4, max_epoch=2, resume=True), resources(ds)
    )
    assert int(out["state"].step) == 2 * step1
    for leaf in leaves(out["state"]):
        assert np.isfinite(leaf).all()


@pytest.mark.slow
def test_dp_pp_loop_trains_and_resumes_exactly(tmp_path, ds):
    """DPxPP through the full loop (2 replicas x 2 stages on the virtual
    fleet): per-device batch scaling doubles the global batch, the sweeps
    run over the 2-D mesh, and stop/resume reproduces the uninterrupted
    run exactly (same standard checkpoint payload)."""

    def cfg(d, **kw):
        c = make_cfg(tmp_path / d, **kw)
        return dataclasses.replace(
            c, mesh=dataclasses.replace(c.mesh, pipeline_data_replicas=2)
        )

    out_a = train(cfg("a"), resources(ds))
    state_a = out_a["state"]
    assert int(state_a.step) > 0
    for leaf in leaves(state_a):
        assert np.isfinite(leaf).all()

    train(cfg("b", max_epoch=1), resources(ds))
    out_b = train(cfg("b", max_epoch=2, resume=True), resources(ds))
    assert int(out_b["state"].step) == int(state_a.step)
    for a, b in zip(leaves(state_a), leaves(out_b["state"])):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


def test_pp_mode_rejects_model_devices(tmp_path, ds):
    cfg = make_cfg(tmp_path / "x")
    cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, model_devices=2)
    )
    with pytest.raises(ValueError, match="exclusive"):
        train(cfg, resources(ds))


def test_pp_data_without_stages_rejected(tmp_path, ds):
    """--pp_data without --pp_stages must fail loud, not silently train
    on the plain mesh with a quarter of the intended scaling."""
    cfg = make_cfg(tmp_path / "y", pp_stages=0)
    cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, pipeline_data_replicas=4)
    )
    with pytest.raises(ValueError, match="pipeline_stages"):
        train(cfg, resources(ds))
