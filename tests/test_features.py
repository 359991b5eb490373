"""10-D eigen-feature stage vs an independent NumPy oracle (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
from sklearn.neighbors import NearestNeighbors

from lpdnet_tpu.ops.features import attach_features, eigen_features

FOUR_THIRDS_PI = 4.0 / 3.0 * np.pi


def numpy_eigen_features(points, k, eps=1e-8):
    """Literal NumPy transcription of the 10-feature definition (oracle)."""
    n = points.shape[0]
    nn = NearestNeighbors(n_neighbors=k, algorithm="brute").fit(points)
    dists, idx = nn.kneighbors(points)
    out = np.zeros((n, 10), np.float64)
    for i in range(n):
        nbrs = points[idx[i]]
        centered = nbrs - nbrs.mean(0)
        cov = centered.T @ centered / k
        lam, vecs = np.linalg.eigh(cov)
        lam = np.maximum(lam[::-1], 0.0)  # descending
        normal = vecs[:, 0]  # eigvec of smallest eigenvalue (eigh ascending)
        s = max(lam.sum(), eps)
        e = lam / s
        cov2 = cov[:2, :2]
        lam2 = np.maximum(np.sort(np.linalg.eigvalsh(cov2))[::-1], 0.0)
        z = nbrs[:, 2]
        r = max(dists[i, -1], eps)
        out[i] = [
            lam[2] / s,
            np.cbrt(max(lam[0] * lam[1] * lam[2], 0.0)),
            (lam[0] - lam[1]) / max(lam[0], eps),
            -np.sum(e * np.log(np.maximum(e, eps))),
            lam2[0] + lam2[1],
            lam2[1] / max(lam2[0], eps),
            z.max() - z.min(),
            z.std(),
            np.log1p(k / (FOUR_THIRDS_PI * r**3 + eps)),
            1.0 - abs(normal[2]),
        ]
    return out


def test_eigen_features_vs_numpy(rng):
    pts = rng.randn(2, 200, 3).astype(np.float32)
    k = 12
    got = np.asarray(eigen_features(jnp.asarray(pts), k, block=64))
    for b in range(2):
        want = numpy_eigen_features(pts[b].astype(np.float64), k)
        np.testing.assert_allclose(got[b], want, rtol=5e-3, atol=5e-3)


def test_eigen_features_degenerate_submap():
    # All points identical: zero covariance everywhere. Must stay finite.
    pts = np.ones((1, 64, 3), np.float32)
    feats = np.asarray(eigen_features(jnp.asarray(pts), 8, block=32))
    assert np.all(np.isfinite(feats))


def test_eigen_features_planar():
    # Perfectly planar cloud: curvature-change ~ 0, verticality ~ 0.
    rs = np.random.RandomState(1)
    xy = rs.randn(1, 128, 2).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((1, 128, 1), np.float32)], axis=-1)
    feats = np.asarray(eigen_features(jnp.asarray(pts), 10, block=64))
    assert np.all(np.isfinite(feats))
    np.testing.assert_allclose(feats[0, :, 0], 0.0, atol=1e-4)  # curvature
    np.testing.assert_allclose(feats[0, :, 9], 0.0, atol=1e-3)  # verticality
    np.testing.assert_allclose(feats[0, :, 6], 0.0, atol=1e-6)  # delta z


def test_attach_features_shape(rng):
    pts = rng.randn(3, 100, 3).astype(np.float32)
    aug = np.asarray(attach_features(jnp.asarray(pts), 8, block=64))
    assert aug.shape == (3, 100, 13)
    np.testing.assert_allclose(aug[..., :3], pts, atol=0)
