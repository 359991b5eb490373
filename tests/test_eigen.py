"""Closed-form eigensolvers vs the NumPy oracle, incl. degenerate inputs
(SURVEY §4: collinear/coplanar/duplicate-point neighbourhoods)."""

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.ops.eigen import (
    eigvals_sym2x2,
    eigvals_sym3x3,
    smallest_eigvec_sym3x3,
)


def _random_sym3(rng, n, scale=1.0):
    m = rng.randn(n, 3, 3).astype(np.float32) * scale
    return (m + m.transpose(0, 2, 1)) / 2


def test_eigvals_sym3x3_random(rng):
    a = _random_sym3(rng, 256)
    got = np.asarray(eigvals_sym3x3(jnp.asarray(a)))
    want = np.sort(np.linalg.eigvalsh(a), axis=-1)[:, ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_eigvals_sym3x3_covariance_scale(rng):
    # Covariance-like PSD matrices at the tiny scales of normalized submaps.
    pts = rng.randn(64, 20, 3).astype(np.float32) * 0.05
    pts -= pts.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", pts, pts) / 20.0
    got = np.asarray(eigvals_sym3x3(jnp.asarray(cov)))
    want = np.sort(np.linalg.eigvalsh(cov), axis=-1)[:, ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-8)


def test_eigvals_degenerate_cases():
    cases = np.stack([
        np.zeros((3, 3)),                      # all-duplicate points
        np.eye(3),                             # spherical
        np.diag([1.0, 1.0, 0.0]),              # coplanar
        np.diag([1.0, 0.0, 0.0]),              # collinear
        np.diag([2.0, 2.0, 2.0]),              # triple eigenvalue
    ]).astype(np.float32)
    got = np.asarray(eigvals_sym3x3(jnp.asarray(cases)))
    want = np.sort(np.linalg.eigvalsh(cases), axis=-1)[:, ::-1]
    # Repeated eigenvalues make acos ill-conditioned at fp32: ~1e-4 abs error.
    np.testing.assert_allclose(got, want, atol=5e-4)
    assert np.all(np.isfinite(got))


def test_eigvals_sym2x2(rng):
    m = rng.randn(128, 2, 2).astype(np.float32)
    a = (m + m.transpose(0, 2, 1)) / 2
    got = np.asarray(eigvals_sym2x2(jnp.asarray(a)))
    want = np.sort(np.linalg.eigvalsh(a), axis=-1)[:, ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smallest_eigvec(rng):
    a = _random_sym3(rng, 128)
    lam = np.asarray(eigvals_sym3x3(jnp.asarray(a)))
    vec = np.asarray(smallest_eigvec_sym3x3(jnp.asarray(a), jnp.asarray(lam[:, 2])))
    # A v = lam_min v  (within tolerance), unit norm.
    av = np.einsum("nij,nj->ni", a, vec)
    np.testing.assert_allclose(av, lam[:, 2:3] * vec, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(vec, axis=-1), 1.0, atol=1e-5)


def test_smallest_eigvec_degenerate():
    a = jnp.zeros((2, 3, 3))
    vec = np.asarray(smallest_eigvec_sym3x3(a, jnp.zeros((2,))))
    assert np.all(np.isfinite(vec))
    np.testing.assert_allclose(np.linalg.norm(vec, axis=-1), 1.0, atol=1e-6)
