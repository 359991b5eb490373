"""Morton-window kNN: recall vs exact on sorted clouds, index-range and
degeneration guarantees, and descriptor invariance of the sorted model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lpdnet_tpu.configs import FeatureConfig, ModelConfig
from lpdnet_tpu.models.model import init_model
from lpdnet_tpu.ops.features import eigen_features_and_knn
from lpdnet_tpu.ops.knn import knn_indices, knn_indices_and_dists
from lpdnet_tpu.ops.morton import morton_sort


def _clustered(rng, b, n):
    centers = rng.randn(8, 3)
    pts = (centers[None, :, None]
           + rng.randn(b, 8, n // 8, 3) * 0.05).reshape(b, n, 3)
    return np.asarray(
        morton_sort(jnp.asarray(pts.astype(np.float32)))
    )


def test_windowed_knn_high_recall_on_sorted_cloud(rng):
    pts = jnp.asarray(_clustered(rng, 2, 512))
    ex = np.asarray(knn_indices(pts, 10, exact=True))
    win = np.asarray(
        knn_indices(pts, 10, block=128, exact=True, window=64)
    )
    rec = np.mean(
        [len(set(a) & set(b)) for A, B in zip(ex, win) for a, b in zip(A, B)]
    ) / 10
    assert rec > 0.9, rec


def test_windowed_indices_stay_global_and_in_range(rng):
    pts = jnp.asarray(_clustered(rng, 1, 256))
    idx = np.asarray(
        knn_indices(pts, 5, block=64, exact=True, window=32)
    )
    assert idx.min() >= 0 and idx.max() < 256
    # Each query's neighbours lie inside its block's window.
    for q in range(256):
        q0 = (q // 64) * 64
        lo = int(np.clip(q0 - 32, 0, 256 - (64 + 64)))
        assert (idx[0, q] >= lo).all() and (idx[0, q] < lo + 128).all()


def test_window_degenerates_to_full_scan(rng):
    pts = jnp.asarray(rng.randn(1, 96, 3).astype(np.float32))
    full = np.asarray(knn_indices(pts, 7, exact=True))
    win = np.asarray(knn_indices(pts, 7, exact=True, window=1024))
    np.testing.assert_array_equal(full, win)


def test_window_rejects_k_larger_than_window(rng):
    pts = jnp.asarray(rng.randn(1, 4096, 3).astype(np.float32))
    with pytest.raises(ValueError, match="candidate window"):
        knn_indices(pts, 20, block=8, window=2)


def test_fused_stats_config_still_usable_with_default_window(rng):
    # Regression: the default knn_window must not make the (negative-result,
    # but supported) fused_stats flag raise at trace time — model.py
    # disables the window for it.
    cfg = ModelConfig(
        trunk="lpdnet", num_points=256, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6,
        features=FeatureConfig(k=6, knn_block=64, fused_stats=True),
    )
    assert cfg.knn_window is not None  # the default that used to crash
    from lpdnet_tpu.models.model import build_model

    model = build_model(cfg)
    pts = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32))
    # The fused kernel itself is TPU-only; tracing (abstract eval) is enough
    # to prove the config no longer hits the fused_stats+window ValueError.
    variables = jax.eval_shape(
        lambda x: model.init(jax.random.key(0), x, train=False), pts
    )
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), variables, pts
    )
    assert out.shape == (1, 32)


def test_window_rejects_non_self_graph(rng):
    q = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    db = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    with pytest.raises(ValueError, match="self-graph"):
        knn_indices_and_dists(q, db, 5, window=16)


def test_windowed_feature_stage_close_to_full(rng):
    pts = jnp.asarray(_clustered(rng, 2, 512))
    f_full, _ = eigen_features_and_knn(pts, 10, block=128, exact=True)
    f_win, i_win = eigen_features_and_knn(
        pts, 10, block=128, exact=True, window=96
    )
    assert np.asarray(i_win).max() < 512
    # Feature rows whose neighbourhood survived the window are identical;
    # overall the stage stays close.
    diff = np.abs(np.asarray(f_full) - np.asarray(f_win))
    assert np.median(diff) < 1e-6
    assert diff.mean() < 0.05


@pytest.mark.slow
def test_sorted_model_descriptor_matches_unsorted(rng):
    # The descriptor must be invariant to the Morton sort itself: the same
    # model run on full scans must produce the same descriptor for sorted
    # and unsorted inputs (permutation invariance), and the windowed default
    # must stay close to the full scan.
    cfg_full = ModelConfig(
        trunk="lpdnet", num_points=256, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, knn_window=None,
        features=FeatureConfig(k=6, knn_block=64),
    )
    model, variables = init_model(cfg_full, jax.random.key(0), batch_size=1)
    pts = _clustered(rng, 2, 256)
    perm = rng.permutation(256)
    d_sorted = np.asarray(model.apply(variables, jnp.asarray(pts)))
    d_perm = np.asarray(model.apply(variables, jnp.asarray(pts[:, perm])))
    cos = np.sum(d_sorted * d_perm, -1)
    assert cos.min() > 0.9999, cos

    cfg_win = ModelConfig(
        trunk="lpdnet", num_points=256, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, knn_window=64,
        features=FeatureConfig(k=6, knn_block=64),
    )
    model_w, _ = init_model(cfg_win, jax.random.key(0), batch_size=1)
    d_win = np.asarray(model_w.apply(variables, jnp.asarray(pts[:, perm])))
    cos = np.sum(d_sorted * d_win, -1)
    assert cos.min() > 0.99, cos
