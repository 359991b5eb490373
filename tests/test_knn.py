"""Blockwise kNN vs sklearn brute force (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
from sklearn.neighbors import NearestNeighbors

from lpdnet_tpu.ops.knn import knn_indices, knn_indices_and_dists
from lpdnet_tpu.ops.pairwise import pairwise_sqdist
from lpdnet_tpu.ops.gather import gather_neighbors


def test_pairwise_sqdist(rng):
    x = rng.randn(2, 50, 3).astype(np.float32)
    y = rng.randn(2, 70, 3).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _check_knn(pts, k, block):
    idx, dist = knn_indices_and_dists(
        jnp.asarray(pts), jnp.asarray(pts), k, block=block
    )
    idx, dist = np.asarray(idx), np.asarray(dist)
    for b in range(pts.shape[0]):
        nn = NearestNeighbors(n_neighbors=k, algorithm="brute").fit(pts[b])
        ref_d, ref_i = nn.kneighbors(pts[b])
        # Indices can differ under distance ties; distances must match.
        np.testing.assert_allclose(dist[b], ref_d**2, rtol=1e-3, atol=1e-5)
    return idx, dist


def test_knn_matches_sklearn(rng):
    pts = rng.randn(2, 300, 3).astype(np.float32)
    _check_knn(pts, k=10, block=128)


def test_knn_block_not_dividing(rng):
    # N not a multiple of the block size: padding path.
    pts = rng.randn(1, 173, 3).astype(np.float32)
    _check_knn(pts, k=5, block=64)


def test_knn_self_is_first(rng):
    pts = rng.randn(1, 100, 3).astype(np.float32)
    idx, dist = knn_indices_and_dists(jnp.asarray(pts), jnp.asarray(pts), 4)
    assert np.all(np.asarray(idx)[0, :, 0] == np.arange(100))
    np.testing.assert_allclose(np.asarray(dist)[0, :, 0], 0.0, atol=1e-6)


def test_knn_exclude_self(rng):
    pts = rng.randn(1, 64, 3).astype(np.float32)
    idx, _ = knn_indices_and_dists(
        jnp.asarray(pts), jnp.asarray(pts), 5, exclude_self=True, block=32
    )
    idx = np.asarray(idx)
    assert np.all(idx[0] != np.arange(64)[:, None])


def test_knn_feature_space(rng):
    pts = rng.randn(1, 80, 3).astype(np.float32)
    feats = rng.randn(1, 80, 16).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(pts), 6, features=jnp.asarray(feats)))
    nn = NearestNeighbors(n_neighbors=6, algorithm="brute").fit(feats[0])
    _, ref_i = nn.kneighbors(feats[0])
    assert (idx[0] == ref_i).mean() > 0.99  # ties may permute


def test_gather_neighbors(rng):
    f = rng.randn(2, 30, 8).astype(np.float32)
    idx = rng.randint(0, 30, size=(2, 30, 4)).astype(np.int32)
    got = np.asarray(gather_neighbors(jnp.asarray(f), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], f[b][idx[b]])
