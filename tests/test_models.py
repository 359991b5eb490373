"""Model forward smoke + invariants (replaces the reference's __main__ smoke
blocks — SURVEY §4 — with real assertions)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lpdnet_tpu.configs import FeatureConfig, ModelConfig
from lpdnet_tpu.models.model import init_model, reference_forward

N = 128  # tiny point count for CPU tests


def small_cfg(trunk):
    return ModelConfig(
        trunk=trunk,
        num_points=N,
        feature_dim=64,
        num_clusters=8,
        output_dim=32,
        graph_k=6,
        features=FeatureConfig(k=6, knn_block=64),
    )


def test_pointnetvlad_forward_shapes(rng):
    cfg = small_cfg("pointnetvlad")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    x = jnp.asarray(rng.randn(2, N, 3).astype(np.float32))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, cfg.output_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
    )


def test_lpdnet_forward_from_xyz(rng):
    cfg = small_cfg("lpdnet")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    x = jnp.asarray(rng.randn(2, N, 3).astype(np.float32))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_lpdnet_accepts_precomputed_13d(rng):
    cfg = small_cfg("lpdnet")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    x13 = jnp.asarray(rng.randn(1, N, 13).astype(np.float32))
    out = model.apply(variables, x13, train=False)
    assert out.shape == (1, cfg.output_dim)


def test_train_mode_updates_batch_stats(rng):
    cfg = small_cfg("pointnetvlad")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    x = jnp.asarray(rng.randn(2, N, 3).astype(np.float32))
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, cfg.output_dim)
    # batch_stats must actually change.
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_reference_layout_shim(rng):
    cfg = small_cfg("pointnetvlad")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    x4 = jnp.asarray(rng.randn(2, 1, N, 3).astype(np.float32))
    out4 = reference_forward(model, variables, x4)
    out3 = model.apply(variables, x4[:, 0], train=False)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out3), atol=1e-6)


def test_forward_jits_and_is_deterministic(rng):
    cfg = small_cfg("pointnetvlad")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    x = jnp.asarray(rng.randn(2, N, 3).astype(np.float32))
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    a = np.asarray(f(variables, x))
    b = np.asarray(f(variables, x))
    np.testing.assert_allclose(a, b, atol=0)
    eager = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(a, eager, rtol=1e-4, atol=1e-5)


def test_lpdnet_non_slab_aligned_point_count(rng):
    """N not a multiple of 16 must take the XLA gather fallback (the
    Pallas kernel requires SLAB-aligned N) and still produce descriptors."""
    cfg = dataclasses.replace(
        small_cfg("lpdnet"), num_points=100, pallas_gather="on"
    )
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    x = jnp.asarray(rng.randn(1, 100, 3).astype(np.float32))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))
