"""Losses vs hand-computed tuples and a literal NumPy transcription of the
reference semantics (SURVEY §4, C14)."""

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.configs import LossConfig
from lpdnet_tpu.losses import (
    best_pos_distance,
    loss_from_config,
    quadruplet_loss,
    triplet_loss,
)


def np_triplet(query, pos, neg, margin, use_min, lazy, ignore_zero):
    pos_d = ((query[:, None, :] - pos) ** 2).sum(-1)
    pd = pos_d.min(1) if use_min else pos_d.max(1)
    neg_d = ((query[:, None, :] - neg) ** 2).sum(-1)
    h = np.maximum(margin + pd[:, None] - neg_d, 0.0)
    per = h.max(1) if lazy else h.sum(1)
    if ignore_zero:
        active = per > 1e-16
        return per[active].sum() / max(active.sum(), 1)
    return per.mean()


def test_best_pos_distance(rng):
    q = rng.randn(4, 8).astype(np.float32)
    p = rng.randn(4, 3, 8).astype(np.float32)
    mn, mx = best_pos_distance(jnp.asarray(q), jnp.asarray(p))
    d = ((q[:, None, :] - p) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(mn), d.min(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mx), d.max(1), rtol=1e-5)


def test_triplet_loss_all_flags(rng):
    q = rng.randn(5, 16).astype(np.float32)
    p = rng.randn(5, 2, 16).astype(np.float32)
    n = rng.randn(5, 9, 16).astype(np.float32)
    for use_min in (False, True):
        for lazy in (False, True):
            for iz in (False, True):
                got = float(triplet_loss(
                    jnp.asarray(q), jnp.asarray(p), jnp.asarray(n),
                    0.5, use_min=use_min, lazy=lazy, ignore_zero_loss=iz,
                ))
                want = np_triplet(q, p, n, 0.5, use_min, lazy, iz)
                np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_quadruplet_hand_computed():
    # One tuple in 1-D descriptors: q=0, pos=1, neg=3, other_neg=10.
    q = jnp.array([[0.0]])
    p = jnp.array([[[1.0]]])
    n = jnp.array([[[3.0]]])
    o = jnp.array([[10.0]])
    # d(q,p)=1; d(q,n)=9 -> hinge1 = max(0, 0.5+1-9)=0
    # d(o,n)=49 -> hinge2 = max(0, 0.2+1-49)=0
    assert float(quadruplet_loss(q, p, n, o, 0.5, 0.2)) == 0.0
    # Harder negative at 1.2: d(q,n)=1.44 -> h1 = 0.5+1-1.44 = 0.06
    # d(o,n)=77.44 -> h2 = 0
    n2 = jnp.array([[[1.2]]])
    np.testing.assert_allclose(
        float(quadruplet_loss(q, p, n2, o, 0.5, 0.2)), 0.06, rtol=1e-5
    )
    # other_neg close to the negative: o=1.4, d(o,n2)=0.04
    # h2 = 0.2+1-0.04 = 1.16 ; total = 0.06+1.16
    o2 = jnp.array([[1.4]])
    np.testing.assert_allclose(
        float(quadruplet_loss(q, p, n2, o2, 0.5, 0.2)), 1.22, rtol=1e-5
    )


def test_loss_from_config_dispatch(rng):
    q = rng.randn(3, 8).astype(np.float32)
    p = rng.randn(3, 2, 8).astype(np.float32)
    n = rng.randn(3, 4, 8).astype(np.float32)
    o = rng.randn(3, 8).astype(np.float32)
    cfg = LossConfig(kind="quadruplet", lazy=True)
    got = float(loss_from_config(
        cfg, jnp.asarray(q), jnp.asarray(p), jnp.asarray(n), jnp.asarray(o)
    ))
    want = float(quadruplet_loss(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(n), jnp.asarray(o),
        0.5, 0.2, lazy=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_triplet_loss_wrapper_ignores_other_neg(rng):
    from lpdnet_tpu.losses import triplet_loss_wrapper

    q = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    p = jnp.asarray(rng.randn(3, 2, 8).astype(np.float32))
    n = jnp.asarray(rng.randn(3, 4, 8).astype(np.float32))
    o = jnp.asarray(rng.randn(3, 8).astype(np.float32))
    got = float(triplet_loss_wrapper(q, p, n, o, 0.5, 0.2, lazy=True))
    want = float(triplet_loss(q, p, n, 0.5, lazy=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)
