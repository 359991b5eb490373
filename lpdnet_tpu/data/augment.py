"""Point-cloud augmentation (host-side NumPy, per-batch).

Reference: ``rotate_point_cloud`` / ``jitter_point_cloud`` (and the
``get_rotated_tuple`` / ``get_jittered_tuple`` wrappers) in
``loading_pointclouds.py`` (SURVEY C5): random rotation about the vertical
axis and clipped Gaussian jitter (sigma ~ 0.005, clip ~ 0.05).

These act only on the xyz columns; appended handcrafted features (columns
3:13) are untouched — rotation about z leaves all ten features invariant
(they are built from z-statistics, eigenvalues, and xy-isotropic
quantities), and jitter-scale perturbations are below feature noise.
"""

from __future__ import annotations

import numpy as np


def rotate_point_cloud(
    batch: np.ndarray,
    rng: np.random.RandomState,
    max_angle_deg: float = 180.0,
) -> np.ndarray:
    """Rotate each cloud by an independent random angle about the z axis.

    Args:
      batch: (B, N, C>=3); only columns 0:3 are rotated.
      max_angle_deg: angles are uniform in [-max, +max] degrees.

    Returns:
      New (B, N, C) array.
    """
    out = batch.copy()
    b = batch.shape[0]
    angles = rng.uniform(-1.0, 1.0, size=b) * np.deg2rad(max_angle_deg)
    c, s = np.cos(angles), np.sin(angles)
    # Per-cloud z-rotation matrices (B, 3, 3).
    rot = np.zeros((b, 3, 3), batch.dtype)
    rot[:, 0, 0] = c
    rot[:, 0, 1] = -s
    rot[:, 1, 0] = s
    rot[:, 1, 1] = c
    rot[:, 2, 2] = 1.0
    out[..., :3] = np.einsum("bnc,bdc->bnd", batch[..., :3], rot)
    return out


def jitter_point_cloud(
    batch: np.ndarray,
    rng: np.random.RandomState,
    sigma: float = 0.005,
    clip: float = 0.05,
) -> np.ndarray:
    """Add clipped Gaussian noise to the xyz columns of each cloud."""
    out = batch.copy()
    noise = np.clip(
        sigma * rng.randn(*batch[..., :3].shape), -clip, clip
    ).astype(batch.dtype)
    out[..., :3] = batch[..., :3] + noise
    return out
