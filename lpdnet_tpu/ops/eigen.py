"""Closed-form symmetric eigensolvers.

The reference computes per-point 3x3 covariance eigenvalues with NumPy
(``numpy.linalg.eig`` per submap, host-side — reference prep script /
``loading_pointclouds.py``, SURVEY C4). On TPU, batched ``jnp.linalg.eigh``
over millions of tiny matrices is a known weak spot (it lowers to a loop of
QR sweeps); the trigonometric (Cardano) closed form is pure elementwise VPU
math and vectorizes perfectly over (B, N) neighborhoods (SURVEY §7 "Design
stance").

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def eigvals_sym3x3(a: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Eigenvalues of symmetric 3x3 matrices, descending (lam1 >= lam2 >= lam3).

    Args:
      a: (..., 3, 3) symmetric matrices (only the upper triangle is trusted).
      eps: degeneracy guard; near-spherical matrices (p ~ 0) return the
        triple eigenvalue tr(a)/3.

    Returns:
      (..., 3) eigenvalues, descending.

    Method: trigonometric solution of the characteristic cubic
    (Smith 1961). For B = (A - q*I)/p with q = tr/3,
    p = sqrt(tr((A-qI)^2)/6), the eigenvalues are
    q + 2p*cos(phi + {0, -2pi/3, +2pi/3}) with phi = acos(det(B)/2)/3.
    """
    a = a.astype(jnp.float32)
    a00 = a[..., 0, 0]
    a11 = a[..., 1, 1]
    a22 = a[..., 2, 2]
    a01 = a[..., 0, 1]
    a02 = a[..., 0, 2]
    a12 = a[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0 = a00 - q
    d1 = a11 - q
    d2 = a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)

    safe_p = jnp.where(p > eps, p, 1.0)
    # det(B) for B = (A - q I)/p, expanded directly on the shifted entries.
    detb = (
        d0 * (d1 * d2 - a12 * a12)
        - a01 * (a01 * d2 - a12 * a02)
        + a02 * (a01 * a12 - d1 * a02)
    ) / (safe_p * safe_p * safe_p)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    lam2 = 3.0 * q - lam1 - lam3

    degenerate = p <= eps
    lam1 = jnp.where(degenerate, q, lam1)
    lam2 = jnp.where(degenerate, q, lam2)
    lam3 = jnp.where(degenerate, q, lam3)
    return jnp.stack([lam1, lam2, lam3], axis=-1)


def eigvals_sym2x2(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric 2x2 matrices, descending.

    Args:
      a: (..., 2, 2) symmetric matrices.

    Returns:
      (..., 2) eigenvalues, descending: (m ± sqrt(((a-c)/2)^2 + b^2)).
    """
    a = a.astype(jnp.float32)
    a00 = a[..., 0, 0]
    a11 = a[..., 1, 1]
    a01 = a[..., 0, 1]
    mean = (a00 + a11) / 2.0
    radius = jnp.sqrt(jnp.maximum(((a00 - a11) / 2.0) ** 2 + a01 * a01, 0.0))
    return jnp.stack([mean + radius, mean - radius], axis=-1)


def smallest_eigvec_sym3x3(
    a: jnp.ndarray, lam_min: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of a symmetric 3x3 matrix.

    Uses the cross-product method: the eigenvector of ``lam`` spans the null
    space of ``M = A - lam*I``; cross products of pairs of rows of ``M`` all
    lie along it. We take all three pairwise cross products and pick the one
    with the largest norm (numerically the best conditioned), falling back to
    ``e_z`` for fully degenerate (spherical) neighborhoods — which makes the
    verticality feature 0 there, matching "no preferred normal".

    Args:
      a: (..., 3, 3) symmetric matrices.
      lam_min: (...,) smallest eigenvalue (from ``eigvals_sym3x3``).
      eps: fallback threshold on the squared cross-product norm of the
        SCALE-NORMALIZED matrix (scale-invariant: a covariance and any
        positive multiple of it hit the fallback identically).

    Returns:
      (..., 3) unit vectors.
    """
    a = a.astype(jnp.float32)
    eye = jnp.eye(3, dtype=a.dtype)
    m = a - lam_min[..., None, None] * eye
    # Normalize by the matrix magnitude BEFORE the cross products: raw
    # cross norms scale as |A|^4, so for normalized submaps (cov entries
    # ~1e-3, norms^2 ~1e-12..1e-14) an absolute eps threshold misread
    # well-conditioned neighborhoods as degenerate and zeroed the
    # verticality feature (round-2 full-scale parity finding).
    scale = jnp.max(jnp.abs(m), axis=(-1, -2), keepdims=True)
    m = m / jnp.maximum(scale, 1e-30)
    r0 = m[..., 0, :]
    r1 = m[..., 1, :]
    r2 = m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    # Pick the largest-norm candidate with a where-chain, NOT
    # argmax+take_along_axis: the gather lowering cost 1.49 ms/iter (9% of
    # the flagship forward — round-4 trace, docs/PERF_LOG.md) while the
    # selects fuse into the surrounding elementwise fusion for free. Tie
    # order matches argmax (first max wins).
    n0 = jnp.sum(c01 * c01, axis=-1)
    n1 = jnp.sum(c02 * c02, axis=-1)
    n2 = jnp.sum(c12 * c12, axis=-1)
    use0 = (n0 >= n1) & (n0 >= n2)
    use1 = n1 >= n2
    vec = jnp.where(
        use0[..., None], c01, jnp.where(use1[..., None], c02, c12)
    )
    nrm = jnp.sum(vec * vec, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=a.dtype), vec.shape
    )
    vec = jnp.where(nrm > eps, vec / jnp.sqrt(jnp.maximum(nrm, eps)), fallback)
    return vec
