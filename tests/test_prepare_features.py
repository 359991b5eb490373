"""Offline 13-D preparation round-trip: write xyz bins, run the prep, load
augmented bins, check against the feature oracle."""

import os

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.data.binio import load_pc_file, save_pc_file
from lpdnet_tpu.data.prepare_features import find_bin_files, prepare_features
from lpdnet_tpu.ops.features import eigen_features

N = 64


def test_prepare_features_roundtrip(tmp_path, rng):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    clouds = {}
    for i in range(5):
        rel = f"run{i % 2}/sub{i}.bin"
        pts = rng.randn(N, 3).astype(np.float32) * 0.3
        clouds[rel] = pts
        save_pc_file(pts, os.path.join(src, rel))

    files = find_bin_files(src)
    assert len(files) == 5
    done = prepare_features(src, dst, files, k=8, batch=2, num_points=N)
    assert done == 5

    for rel, pts in clouds.items():
        aug = load_pc_file(rel, dst, num_points=N)
        assert aug.shape == (N, 13)
        np.testing.assert_allclose(aug[:, :3], pts, atol=1e-6)
        want = np.asarray(eigen_features(jnp.asarray(pts[None]), 8))[0]
        np.testing.assert_allclose(aug[:, 3:], want, rtol=1e-4, atol=1e-4)
