"""EdgeConv's per-point decomposition must match the naive per-edge concat
formulation exactly (same parameters), and edge_features stays correct."""

import numpy as np
import jax
import jax.numpy as jnp

from lpdnet_tpu.models.lpdnet import EdgeConv
from lpdnet_tpu.ops.edgeconv import edge_features
from lpdnet_tpu.ops.gather import gather_neighbors


def test_edge_features_values(rng):
    x = rng.randn(2, 20, 5).astype(np.float32)
    idx = rng.randint(0, 20, (2, 20, 3)).astype(np.int32)
    e = np.asarray(edge_features(jnp.asarray(x), jnp.asarray(idx)))
    assert e.shape == (2, 20, 3, 10)
    for b in range(2):
        for i in range(20):
            for j in range(3):
                nbr = x[b, idx[b, i, j]]
                np.testing.assert_allclose(e[b, i, j, :5], nbr - x[b, i], atol=1e-6)
                np.testing.assert_allclose(e[b, i, j, 5:], x[b, i], atol=1e-6)


def test_edgeconv_decomposition_matches_naive(rng):
    b, n, k, c, width = 2, 32, 5, 8, 16
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))

    mod = EdgeConv(width, bn_placement="edge")
    variables = mod.init(jax.random.key(0), x, idx)
    out = mod.apply(variables, x, idx, train=False)

    # Naive: Dense over concat([x_j - x_i, x_i]) with the SAME kernel,
    # then identical BN (inference stats) + relu + max.
    kernel = np.asarray(variables["params"]["kernel"])
    e = np.asarray(edge_features(x, idx))  # (B, N, k, 2C)
    h = e @ kernel
    bnp = variables["params"]["bn"]
    bst = variables["batch_stats"]["bn"]
    h = (h - np.asarray(bst["mean"])) / np.sqrt(np.asarray(bst["var"]) + 1e-5)
    h = h * np.asarray(bnp["scale"]) + np.asarray(bnp["bias"])
    want = np.maximum(h, 0.0).max(axis=2)

    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_edgeconv_train_mode_finite(rng):
    b, n, k, c = 2, 16, 4, 6
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    mod = EdgeConv(8)  # default post-aggregation BN
    variables = mod.init(jax.random.key(0), x, idx)
    out, mutated = mod.apply(
        variables, x, idx, train=True, mutable=["batch_stats"]
    )
    assert np.all(np.isfinite(np.asarray(out)))
