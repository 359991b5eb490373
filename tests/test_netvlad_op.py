"""NetVLAD aggregation core vs a literal NumPy transcription (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.ops.netvlad import netvlad_aggregate


def np_netvlad(x, logits, centers, eps=1e-12):
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    vlad = np.einsum("bnk,bnd->bkd", a, x) - a.sum(1)[..., None] * centers[None]
    vlad = vlad / np.sqrt((vlad**2).sum(-1, keepdims=True) + eps)
    flat = vlad.reshape(x.shape[0], -1)
    return flat / np.sqrt((flat**2).sum(-1, keepdims=True) + eps)


def test_netvlad_aggregate(rng):
    b, n, d, k = 2, 50, 16, 8
    x = rng.randn(b, n, d).astype(np.float32)
    logits = rng.randn(b, n, k).astype(np.float32)
    centers = rng.randn(k, d).astype(np.float32)
    got = np.asarray(netvlad_aggregate(
        jnp.asarray(x), jnp.asarray(logits), jnp.asarray(centers)
    ))
    want = np_netvlad(x, logits, centers)
    assert got.shape == (b, k * d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), 1.0, atol=1e-5
    )


def test_netvlad_degenerate_zero_residual_stays_finite(rng):
    # Features coinciding with a center give a ~0 residual for that cluster;
    # intra-normalization must not produce NaN/inf on it (eps guard).
    b, n, d, k = 1, 10, 4, 2
    centers = rng.randn(k, d).astype(np.float32)
    x = np.broadcast_to(centers[0], (b, n, d)).astype(np.float32).copy()
    logits = np.zeros((b, n, k), np.float32)
    logits[..., 0] = 50.0  # hard-assign to cluster 0
    got = np.asarray(netvlad_aggregate(
        jnp.asarray(x), jnp.asarray(logits), jnp.asarray(centers)
    ))
    assert np.all(np.isfinite(got))
    # And it still matches the literal transcription.
    want = np_netvlad(x, logits, centers)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
