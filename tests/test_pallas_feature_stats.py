"""Fused Pallas neighbourhood-stats kernel vs the XLA masked-moment path
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.ops.features import eigen_features_and_knn
from lpdnet_tpu.ops.knn import knn_indices_and_dists
from lpdnet_tpu.ops.pallas.feature_stats import neighborhood_stats


def test_neighborhood_stats_matches_masked_path(rng):
    b, n, k = 2, 128, 8
    pts = rng.randn(b, n, 3).astype(np.float32) * 0.3
    # Threshold midway between the k-th and (k+1)-th distances: no float
    # ambiguity at the mask boundary between the kernel's matmul-form
    # distances and the oracle's direct differences.
    _, dist = knn_indices_and_dists(
        jnp.asarray(pts), jnp.asarray(pts), k + 1, block=64, exact=True
    )
    dist = np.asarray(dist)
    kth = (dist[..., -2] + dist[..., -1]) / 2.0
    sums, zmax, zmin = neighborhood_stats(
        jnp.asarray(pts), jnp.asarray(kth), tile=64, interpret=True
    )
    sums, zmax, zmin = np.asarray(sums), np.asarray(zmax), np.asarray(zmin)

    # Oracle: explicit mask against the same threshold.
    for bb in range(b):
        d = ((pts[bb][:, None] - pts[bb][None]) ** 2).sum(-1)
        mask = d <= kth[bb][:, None]
        cnt = mask.sum(-1)
        np.testing.assert_allclose(sums[bb, :, 9], cnt, atol=1e-3)
        np.testing.assert_allclose(
            sums[bb, :, 0], (mask * pts[bb][None, :, 0]).sum(-1),
            rtol=1e-4, atol=1e-4,
        )
        z = pts[bb][:, 2]
        want_zmax = np.where(mask, z[None], -np.inf).max(-1)
        np.testing.assert_allclose(zmax[bb], want_zmax, atol=1e-6)
        want_zmin = np.where(mask, z[None], np.inf).min(-1)
        np.testing.assert_allclose(zmin[bb], want_zmin, atol=1e-6)


def test_fused_stats_path_shapes(rng):
    # The fused path only executes on TPU (pallas CPU requires interpret
    # mode); abstract evaluation checks shapes/dtypes wire up. Numeric
    # equivalence of the kernel itself is covered above; the scan path is
    # checked against the gather oracle in tests/test_features_fused.py.
    import jax

    pts = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
    out = jax.eval_shape(
        lambda p: eigen_features_and_knn(p, 8, block=64, fused_stats=True),
        pts,
    )
    assert out[0].shape == (1, 128, 10)
    assert out[1].shape == (1, 128, 8)
    assert out[1].dtype == jnp.int32
