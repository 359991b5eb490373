"""Pallas kernels vs their XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.pallas.edge_gather import edge_max_gather
from lpdnet_tpu.ops.pallas.gather_mxu import gather_neighbors_mxu


def test_edge_max_gather_matches_oracle(rng):
    b, n, k, c = 2, 64, 5, 16
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    got = np.asarray(edge_max_gather(f, idx, tile_m=32, interpret=True))
    want = np.asarray(jnp.max(gather_neighbors(f, idx), axis=2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_edge_max_gather_pad_path(rng):
    # M not a multiple of tile_m exercises the pad-and-slice path.
    b, n, k, c = 1, 48, 4, 8
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, 40, k)).astype(np.int32))
    got = np.asarray(edge_max_gather(f, idx, tile_m=32, interpret=True))
    want = np.asarray(jnp.max(gather_neighbors(f, idx), axis=2))
    assert got.shape == (1, 40, c)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_edge_max_gather_bf16(rng):
    b, n, k, c = 1, 32, 3, 8
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    got = np.asarray(
        edge_max_gather(f, idx, tile_m=32, interpret=True).astype(jnp.float32)
    )
    want = np.asarray(
        jnp.max(gather_neighbors(f, idx), axis=2).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_gather_mxu_matches_oracle(rng):
    b, n, k, c = 2, 64, 4, 16
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, 32, k)).astype(np.int32))
    got = np.asarray(gather_neighbors_mxu(f, idx, tile_m=16, interpret=True))
    want = np.asarray(gather_neighbors(f, idx))
    # bf16 one-hot matmul: ~1e-2 abs tolerance.
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_edge_max_gather_trainable_grad_matches_autodiff(rng):
    import jax
    from functools import partial
    import lpdnet_tpu.ops.pallas.edge_gather as eg

    b, n, k, c = 2, 64, 5, 16
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    # kNN indices are distinct within a row (top-k of distinct positions);
    # with distinct gathered values the eq-mask backward equals autodiff.
    idx = jnp.asarray(np.stack([
        np.stack([rng.choice(n, k, replace=False) for _ in range(n)])
        for _ in range(b)
    ]).astype(np.int32))
    dout = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    def ref_loss(f):
        return jnp.sum(jnp.max(gather_neighbors(f, idx), axis=2) * dout)

    want = np.asarray(jax.grad(ref_loss)(f))

    out = eg.edge_max_gather(f, idx, tile_m=32, interpret=True)
    got = np.asarray(
        eg._edge_max_bwd(f, idx, out, dout, tile_m=32, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_edge_max_bwd_pad_path(rng):
    import jax
    import lpdnet_tpu.ops.pallas.edge_gather as eg

    b, n, k, c = 1, 48, 3, 8
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(np.stack([
        np.stack([rng.choice(n, k, replace=False) for _ in range(40)])
        for _ in range(b)
    ]).astype(np.int32))
    dout = jnp.asarray(rng.randn(b, 40, c).astype(np.float32))

    def ref_loss(f):
        return jnp.sum(jnp.max(gather_neighbors(f, idx), axis=2) * dout)

    want = np.asarray(jax.grad(ref_loss)(f))
    out = eg.edge_max_gather(f, idx, tile_m=32, interpret=True)
    got = np.asarray(
        eg._edge_max_bwd(f, idx, out, dout, tile_m=32, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
