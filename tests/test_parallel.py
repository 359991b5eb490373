"""Data-parallel sharding over the virtual 8-device CPU mesh: the sharded
train step must match the single-device step numerically, and batches must
actually shard (SURVEY §4 "distributed without a cluster")."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from lpdnet_tpu.configs import Config, ModelConfig, TrainConfig
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import make_embed_fn, make_train_step

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
    return model, state, cfg_t, batch


def test_mesh_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_batch_actually_sharded():
    mesh = make_mesh(8)
    x = jnp.zeros((8, N, 3))
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert len(sharded.sharding.device_set) == 8
    # Each device holds 1/8 of the batch.
    shard = sharded.addressable_shards[0]
    assert shard.data.shape == (1, N, 3)


def test_sharded_step_matches_single_device():
    model, state, cfg_t, batch = make_bits()
    mesh = make_mesh(8)

    step_single = make_train_step(model, cfg_t.loss, donate=False)
    _, loss_s = step_single(state, batch)

    step_mesh = make_train_step(model, cfg_t.loss, mesh=mesh, donate=False)
    state_m = replicate(state, mesh)
    batch_m = shard_batch(batch, mesh)
    state_m2, loss_m = step_mesh(state_m, batch_m)

    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-4)
    # The sharded step's output state is still replicated (no silent reshard).
    for leaf in jax.tree_util.tree_leaves(state_m2.params):
        assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_gradients_match_single_device():
    # Gradients (pre-optimizer) must agree across the sharding boundary —
    # comparing post-Adam params would amplify float-order noise in
    # near-zero gradients to the full learning-rate scale.
    from lpdnet_tpu.losses import loss_from_config
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, state, cfg_t, batch = make_bits()
    mesh = make_mesh(8)
    p, m = 2, 4

    def loss_fn(params, flat, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            flat, train=True, mutable=["batch_stats"],
        )
        desc = out.reshape(b, 1 + p + m + 1, -1)
        return loss_from_config(
            cfg_t.loss, desc[:, 0], desc[:, 1:1 + p],
            desc[:, 1 + p:1 + p + m], desc[:, -1],
        )

    flat = np.concatenate(
        [batch["query"][:, None], batch["positives"], batch["negatives"],
         batch["other_neg"][:, None]], axis=1,
    ).reshape(-1, N, 3)
    b = batch["query"].shape[0]

    g_single = jax.grad(loss_fn)(state.params, flat, b)
    grad_fn = jax.jit(
        jax.grad(loss_fn),
        static_argnums=(2,),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
    )
    g_mesh = grad_fn(replicate(state.params, mesh), jnp.asarray(flat), b)

    # Reduction-order differences (sharded partial sums + psum vs one sum)
    # compound through the BatchNorm chain; require close direction + scale
    # rather than elementwise bit-parity.
    for a, c in zip(
        jax.tree_util.tree_leaves(g_single),
        jax.tree_util.tree_leaves(jax.device_get(g_mesh)),
    ):
        a, c = np.asarray(a).ravel(), np.asarray(c).ravel()
        na, nc = np.linalg.norm(a), np.linalg.norm(c)
        if na < 1e-7 and nc < 1e-7:
            continue
        cos = float(np.dot(a, c) / (na * nc))
        assert cos > 0.999, cos
        np.testing.assert_allclose(na, nc, rtol=5e-3)


def test_sharded_embed_matches_single_device():
    model, state, cfg_t, batch = make_bits()
    mesh = make_mesh(8)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pts = batch["query"]  # (8, N, 3)

    single = make_embed_fn(model)(variables, pts)
    sharded = make_embed_fn(model, mesh=mesh)(
        replicate(variables, mesh),
        jax.device_put(jnp.asarray(pts), batch_sharding(mesh)),
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=1e-4, atol=1e-5
    )


def _loop_cfg(tmp_path, name, batch_num_queries, batch_scaling,
              max_epoch=1, num_devices=None):
    from lpdnet_tpu.configs import (
        Config, DataConfig, EvalConfig, MeshConfig, ModelConfig, TrainConfig,
    )

    return Config(
        model=ModelConfig(
            trunk="pointnetvlad", num_points=N, feature_dim=64,
            num_clusters=8, output_dim=32, use_input_transform=False,
        ),
        data=DataConfig(num_points=N),
        train=TrainConfig(
            batch_num_queries=batch_num_queries, positives_per_query=2,
            negatives_per_query=4, max_epoch=max_epoch,
            log_dir=str(tmp_path / name),
        ),
        eval=EvalConfig(batch_size=8),
        mesh=MeshConfig(num_devices=num_devices, batch_scaling=batch_scaling),
    )


def _epoch_losses(log_dir):
    import json

    with open(f"{log_dir}/metrics.jsonl") as f:
        recs = [json.loads(line) for line in f]
    return [r["loss"] for r in recs if r["event"] == "epoch"]


def test_train_loop_fit_mode_shrinks_mesh_to_divide_batch(tmp_path):
    """batch_scaling='fit': batch_num_queries=2 on an 8-device mesh must not
    crash — the loop shrinks the mesh to the largest divisor of the batch
    (regression: shard_batch used to raise 'axis 0 not divisible by 8')."""
    from lpdnet_tpu.data.synthetic import make_synthetic_dataset
    from lpdnet_tpu.data.tuples import TupleSampler
    from lpdnet_tpu.train.loop import TrainResources, train

    ds = make_synthetic_dataset(num_places=5, submaps_per_place=4, num_points=N)
    cfg = _loop_cfg(tmp_path, "fit", batch_num_queries=2, batch_scaling="fit")
    res = TrainResources(
        sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
        loader=ds.loader,
    )
    out = train(cfg, res, use_mesh=True)
    assert int(out["state"].step) > 0


@pytest.mark.slow
def test_per_device_batch_scaling_matches_single_device_trajectory(tmp_path):
    """batch_scaling='per_device' (default): the global batch scales with
    the mesh (B x ndev, no idle chips — VERDICT round 1 weak #3), and the
    loss trajectory matches a single-device run on the same global batch."""
    from lpdnet_tpu.data.synthetic import make_synthetic_dataset
    from lpdnet_tpu.data.tuples import TupleSampler
    from lpdnet_tpu.train.loop import TrainResources, train

    ds = make_synthetic_dataset(num_places=8, submaps_per_place=4, num_points=N)

    def resources():
        return TrainResources(
            sampler=TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4),
            loader=ds.loader,
        )

    # 8-device mesh, 2 queries per device -> global batch 16.
    cfg_mesh = _loop_cfg(
        tmp_path, "mesh", batch_num_queries=2, batch_scaling="per_device",
        max_epoch=2,
    )
    out_mesh = train(cfg_mesh, resources(), use_mesh=True)

    # Single device on the SAME global batch (16) and seed.
    cfg_single = _loop_cfg(
        tmp_path, "single", batch_num_queries=16, batch_scaling="per_device",
        max_epoch=2,
    )
    out_single = train(cfg_single, resources(), use_mesh=False)

    # 32 eligible queries / global batch 16 -> 2 steps per epoch on BOTH.
    assert int(out_mesh["state"].step) == int(out_single["state"].step) == 4

    losses_mesh = _epoch_losses(cfg_mesh.train.log_dir)
    losses_single = _epoch_losses(cfg_single.train.log_dir)
    np.testing.assert_allclose(losses_mesh, losses_single, rtol=1e-3)


def test_ddp_shard_map_step_matches_single_device_on_replicated_batch():
    """With every device holding an IDENTICAL batch shard, per-replica BN
    equals global BN, so the shard_map DDP step must reproduce the
    single-device step exactly (loss and updated params)."""
    from lpdnet_tpu.parallel.ddp import make_ddp_train_step
    from lpdnet_tpu.parallel.mesh import replicate

    model, state, cfg_t, batch = make_bits()  # batch_num_queries=8
    # Replicate one query's tuple 8x so each of the 8 devices sees the
    # same shard.
    batch = {k: np.repeat(v[:1], 8, axis=0) for k, v in batch.items()}

    step_single = make_train_step(model, cfg_t.loss, donate=False)
    # Single-device equivalent: ONE copy of the tuple (the mean over 8
    # identical tuples equals the value on one).
    single_batch = {k: v[:1] for k, v in batch.items()}
    state_s, loss_s = step_single(state, single_batch)

    mesh = make_mesh(8)
    ddp_step = make_ddp_train_step(model, cfg_t.loss, mesh)
    state_m, loss_m = ddp_step(replicate(state, mesh), batch)

    np.testing.assert_allclose(float(loss_s), float(loss_m), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_s.params),
        jax.tree_util.tree_leaves(jax.device_get(state_m.params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow
def test_ddp_shard_map_step_trains():
    """Distinct shards: the DDP step must run and decrease loss.

    Slow lane since round 5's third hygiene pass: the single-step DDP
    parity test above (replicated batch vs the single-device step) is the
    default-lane representative; this 6-step soak adds only optimizer
    compounding on top of it."""
    from lpdnet_tpu.parallel.ddp import make_ddp_train_step
    from lpdnet_tpu.parallel.mesh import replicate

    model, state, cfg_t, batch = make_bits()
    mesh = make_mesh(8)
    ddp_step = make_ddp_train_step(model, cfg_t.loss, mesh)
    state = replicate(state, mesh)
    losses = []
    for _ in range(6):
        state, loss = ddp_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_ddp_rejects_ignore_zero_loss():
    from lpdnet_tpu.configs import LossConfig
    from lpdnet_tpu.parallel.ddp import make_ddp_train_step

    model, state, cfg_t, batch = make_bits()
    mesh = make_mesh(8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ignore_zero_loss"):
        make_ddp_train_step(
            model, LossConfig(ignore_zero_loss=True), mesh
        )
