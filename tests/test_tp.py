"""Tensor-parallel NetVLAD head over the virtual 8-device fleet: a 2-D
(data, model) mesh must reproduce the single-device numerics while the head
parameters are ACTUALLY sharded (SURVEY §4 "distributed without a cluster";
parallelism beyond the reference's DataParallel — SURVEY C20)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lpdnet_tpu.configs import ModelConfig, TrainConfig
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.parallel.tp import (
    check_divisibility,
    make_mesh_2d,
    make_multislice_mesh,
    make_tp_embed_fn,
    make_tp_train_step,
    partition_specs,
    shard_state,
)
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import make_train_step

N = 64


def make_bits():
    cfg_m = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, use_input_transform=False,
    )
    cfg_t = TrainConfig(
        batch_num_queries=8, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=1e-3,
    )
    model, state = create_train_state(cfg_m, cfg_t, jax.random.key(0))
    ds = make_synthetic_dataset(num_places=8, submaps_per_place=4, num_points=N)
    sampler = TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4)
    rng = np.random.RandomState(0)
    _, batch = next(sampler.epoch_batches(8, rng))
    return cfg_m, model, state, cfg_t, batch


def test_mesh_2d_shape():
    mesh = make_mesh_2d(2, 4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_multislice_mesh_fallback_blocks():
    # No slice_index on CPU devices -> contiguous pseudo-slices.
    mesh = make_multislice_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_multislice_mesh_rejects_oversubscription():
    import pytest

    with pytest.raises(ValueError, match="need"):
        make_multislice_mesh(4, 4)  # 16 > 8 virtual devices


def test_partition_specs_target_only_the_head():
    _, model, state, _, _ = make_bits()
    specs = partition_specs(state.params)
    flat = {
        jax.tree_util.keystr(p): s
        for p, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }
    sharded = {k: s for k, s in flat.items() if s != P()}
    assert sharded, "head rules matched nothing"
    for k in sharded:
        assert "netvlad" in k, k
    # The big projection is row-sharded.
    hid = [s for k, s in sharded.items() if "hidden1_weights" in k]
    assert hid == [P("model", None)]


def test_head_params_actually_sharded():
    _, model, state, _, _ = make_bits()
    mesh = make_mesh_2d(2, 4)
    st = shard_state(state, mesh)
    hid = st.params["netvlad"]["hidden1_weights"]["kernel"]
    # (K*D, out) row-sharded over model=4: each shard holds 1/4 of the rows.
    assert hid.addressable_shards[0].data.shape[0] == hid.shape[0] // 4
    # Adam moments mirror the param sharding.
    mu_leaf = jax.tree_util.tree_leaves(
        st.opt_state[0].mu["netvlad"]["hidden1_weights"]
    )[0]
    assert mu_leaf.addressable_shards[0].data.shape[0] == hid.shape[0] // 4
    # Trunk stays replicated.
    trunk_leaf = jax.tree_util.tree_leaves(st.params["trunk"])[0]
    assert trunk_leaf.sharding.is_fully_replicated


def test_tp_step_matches_single_device():
    cfg_m, model, state, cfg_t, batch = make_bits()
    mesh = make_mesh_2d(2, 4)
    check_divisibility(cfg_m.num_clusters, mesh, "model")

    step_single = make_train_step(model, cfg_t.loss, donate=False)
    state_s, loss_s = step_single(state, batch)

    tp_step = make_tp_train_step(
        model, cfg_t.loss, mesh, state, donate=False
    )
    st = shard_state(state, mesh)
    st2, loss_m = tp_step(st, batch)

    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-4)
    # Updated head params agree with the single-device update.
    a = np.asarray(state_s.params["netvlad"]["hidden1_weights"]["kernel"])
    b = np.asarray(
        jax.device_get(st2.params["netvlad"]["hidden1_weights"]["kernel"])
    )
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
    # And stay in their sharding (no silent replication).
    hid = st2.params["netvlad"]["hidden1_weights"]["kernel"]
    assert hid.addressable_shards[0].data.shape[0] == hid.shape[0] // 4


@pytest.mark.slow
def test_tp_step_trains():
    _, model, state, cfg_t, batch = make_bits()
    mesh = make_mesh_2d(2, 4)
    tp_step = make_tp_train_step(model, cfg_t.loss, mesh, state, donate=False)
    st = shard_state(state, mesh)
    losses = []
    for _ in range(6):
        st, loss = tp_step(st, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_tp_embed_matches_single_device():
    _, model, state, cfg_t, batch = make_bits()
    mesh = make_mesh_2d(2, 4)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pts = jnp.asarray(batch["query"])  # (8, N, 3)

    single = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, pts)
    tp_embed = make_tp_embed_fn(model, mesh, variables)
    sharded = tp_embed(shard_state(variables, mesh), pts)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_tp_train_loop_matches_data_parallel_trajectory(tmp_path):
    """End-to-end: the loop on an 8-device (4 data x 2 model) mesh must
    reproduce the 4-device pure-data-parallel loop on the same global batch
    (TP only re-shards the head; the math is unchanged)."""
    import json

    from lpdnet_tpu.configs import (
        Config, DataConfig, EvalConfig, MeshConfig, TrainConfig,
    )
    from lpdnet_tpu.train.loop import TrainResources, train

    ds = make_synthetic_dataset(num_places=8, submaps_per_place=4, num_points=N)

    def run(name, mesh_cfg):
        cfg = Config(
            model=ModelConfig(
                trunk="pointnetvlad", num_points=N, feature_dim=64,
                num_clusters=8, output_dim=32, use_input_transform=False,
            ),
            data=DataConfig(num_points=N),
            train=TrainConfig(
                batch_num_queries=2, positives_per_query=2,
                negatives_per_query=4, max_epoch=2,
                log_dir=str(tmp_path / name),
            ),
            eval=EvalConfig(batch_size=8),
            mesh=mesh_cfg,
        )
        res = TrainResources(
            sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
            loader=ds.loader,
        )
        out = train(cfg, res, use_mesh=True)
        with open(f"{cfg.train.log_dir}/metrics.jsonl") as f:
            recs = [json.loads(line) for line in f]
        return out, [r["loss"] for r in recs if r["event"] == "epoch"]

    out_tp, losses_tp = run(
        "tp", MeshConfig(num_devices=8, model_devices=2)
    )
    out_dp, losses_dp = run("dp", MeshConfig(num_devices=4))
    assert int(out_tp["state"].step) == int(out_dp["state"].step) > 0
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=1e-3)


def test_check_divisibility_rejects_bad_split():
    import pytest

    mesh = make_mesh_2d(2, 4)
    with pytest.raises(ValueError, match="not divisible"):
        check_divisibility(6, mesh, "model")
