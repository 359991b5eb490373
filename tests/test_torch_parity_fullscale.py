"""Full-scale cross-framework parity (VERDICT round 1, item 3).

The round-1 parity oracle ran at toy scale (N=128, 64-D trunk, 8 clusters)
and never covered the on-device feature stage or the reference-literal
per-edge BN placement. These tests close that:

1. flagship shape (4096 pts, 1024-D trunk, 64 clusters, 256-D out, k=20)
   end-to-end INCLUDING the production feature stage
   (compute_features_on_device=True, masked-moment + approx selection):
   oracle = NumPy exact-k features -> CPU-torch trunk + NetVLAD;
2. the production feature op (eigen_features_and_knn) vs the NumPy oracle
   at flagship point count;
3. edge_bn_placement='edge' (the reference's conv-BN-relu-max order)
   end-to-end vs a per-edge torch oracle.

Pass bar (VERDICT): cosine >= 1 - 1e-3 on all end-to-end tests.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lpdnet_tpu.configs import FeatureConfig, ModelConfig  # noqa: E402
from lpdnet_tpu.models.model import init_model  # noqa: E402
from lpdnet_tpu.ops.features import eigen_features_and_knn  # noqa: E402

from test_features import numpy_eigen_features  # noqa: E402
from test_torch_parity import (  # noqa: E402
    t,
    to_pytree,
    torch_bn,
    torch_lpd_trunk,
    torch_netvlad,
    torch_point_mlp,
)


def clustered_clouds(rng, b, n, clusters=6):
    """Synthetic submap-like clouds (clustered, normalized) — realistic
    neighbourhood structure, far fewer kNN ties than uniform noise."""
    out = np.empty((b, n, 3), np.float32)
    for i in range(b):
        centers = rng.uniform(-0.7, 0.7, (clusters, 3))
        scales = rng.uniform(0.05, 0.25, (clusters, 1))
        per = n // clusters
        pts = [
            c + rng.randn(per, 3) * s for c, s in zip(centers, scales)
        ]
        pts.append(centers[0] + rng.randn(n - per * clusters, 3) * scales[0])
        out[i] = np.clip(np.concatenate(pts), -1, 1)
    return out


def batched_numpy_features(pts, k):
    return np.stack(
        [numpy_eigen_features(p.astype(np.float64), k) for p in pts]
    ).astype(np.float32)


def _eigengap_mask(pts, k, tau=0.1):
    """Points whose neighbourhood covariance has a clear smallest-eigenpair
    gap (lam2 - lam3 > tau * lam1): only there is the normal direction —
    hence verticality — numerically well-defined. Where lam2 ~= lam3 the
    eigenvector is arbitrary within the subspace and ANY two correct
    implementations may disagree (observed between NumPy float64 eigh and
    the closed-form f32 solver on both exact and approx paths)."""
    from sklearn.neighbors import NearestNeighbors

    masks = []
    for p in pts:
        nn = NearestNeighbors(n_neighbors=k, algorithm="brute").fit(p)
        _, idx = nn.kneighbors(p)
        nbrs = p[idx]
        c = nbrs - nbrs.mean(1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", c, c) / k
        lam = np.linalg.eigvalsh(cov)[:, ::-1]  # descending
        masks.append(
            (lam[:, 1] - lam[:, 2]) > tau * np.maximum(lam[:, 0], 1e-12)
        )
    return np.stack(masks)


@pytest.mark.slow
def test_feature_stage_exact_path_parity(rng):
    """The exact-k device path (the fidelity-audit switch) must match the
    NumPy oracle tightly at flagship point count; verticality is compared
    only where the normal direction is well-conditioned."""
    k = 20
    pts = clustered_clouds(rng, 1, 4096)
    got = np.asarray(
        eigen_features_and_knn(jnp.asarray(pts), k, block=1024, exact=True)[0]
    )
    want = batched_numpy_features(pts, k)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-2)
    assert np.quantile(rel[..., :9], 0.99) < 1e-2, np.quantile(rel[..., :9], 0.99)
    cond = _eigengap_mask(pts, k)
    vert_rel = rel[..., 9][cond]
    assert np.quantile(vert_rel, 0.99) < 2e-2, np.quantile(vert_rel, 0.99)


@pytest.mark.slow
def test_feature_stage_production_parity(rng):
    """The masked-moment + approx-selection feature op (the path the
    flagship model actually runs) vs the exact-k NumPy oracle at flagship
    point count. bf16 distance rounding blurs ties at the k-th neighbour,
    so the mask can differ from the exact-k set on near-tie neighbourhoods:
    bulk agreement must be tight, the tail bounded (the retrieval-level
    effect is covered by the full-scale descriptor parity test)."""
    k = 20
    pts = clustered_clouds(rng, 1, 4096)
    got, idx = eigen_features_and_knn(
        jnp.asarray(pts), k, block=1024, recall_target=0.85
    )
    got = np.asarray(got)
    want = batched_numpy_features(pts, k)
    assert got.shape == want.shape == (1, 4096, 10)
    assert idx.shape == (1, 4096, k)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-2)
    stable = rel[..., :9]  # verticality checked separately (conditioning)
    assert np.median(stable) < 2e-3, np.median(stable)
    assert np.quantile(stable, 0.95) < 0.15, np.quantile(stable, 0.95)
    cond = _eigengap_mask(pts, k)
    vert_rel = rel[..., 9][cond]
    assert np.median(vert_rel) < 2e-3, np.median(vert_rel)


@pytest.mark.slow
def test_lpdnet_fullscale_descriptor_parity(rng):
    """Flagship LPD-Net (4096 pts / 1024-D trunk / 64 clusters / 256-D
    descriptors, k=20) with the ON-DEVICE feature stage, vs a fully
    independent oracle: NumPy exact-k features feeding the CPU-torch trunk
    and NetVLAD head."""
    cfg = ModelConfig(
        trunk="lpdnet", num_points=4096, feature_dim=1024, num_clusters=64,
        output_dim=256, graph_k=20, compute_features_on_device=True,
        # The torch oracle implements the reference's hard-max gather;
        # 'auto' resolves to lse since round 4, so pin max here.
        aggregation="max",
        features=FeatureConfig(k=20, knn_block=1024),
        # Full candidate scans: this test isolates the bf16/selection/mask
        # approximations against the exact torch oracle; the Morton-window
        # approximation has its own fidelity suite (test_knn_window.py).
        knn_window=None,
    )
    model, variables = init_model(cfg, jax.random.key(11), batch_size=1)

    # Populate BN statistics with a train-mode pass on separate clouds.
    x_warm = jnp.asarray(clustered_clouds(rng, 2, 4096))
    _, mutated = model.apply(
        variables, x_warm, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mutated["batch_stats"]}

    x = clustered_clouds(rng, 2, 4096)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert ours.shape == (2, 256)

    feats = batched_numpy_features(x, cfg.features.k)
    x13 = np.concatenate([x, feats], axis=-1)
    tree = to_pytree(variables)
    trunk = torch_lpd_trunk(
        t(x13), tree["params"]["trunk"], tree["batch_stats"]["trunk"],
        cfg.graph_k,
    )
    theirs = torch_netvlad(
        trunk, tree["params"]["netvlad"], tree["batch_stats"]["netvlad"],
        cfg.add_batch_norm, cfg.gating, cfg.post_projection_bn,
    )
    theirs = theirs / torch.sqrt((theirs**2).sum(-1, keepdim=True) + 1e-12)
    theirs = theirs.numpy()

    cos = (ours * theirs).sum(-1)
    np.testing.assert_array_less(1.0 - 1e-3, cos)


def torch_edge_conv_edge(x, idx, params, stats):
    """Per-edge BN placement (reference-literal conv-BN-relu-max): the
    decomposed projection per edge, BN on the (B, N, k, C) edge tensor,
    relu, then max over neighbours."""
    kernel = t(params["kernel"])
    c = x.shape[-1]
    w_nbr, w_ctr = kernel[:c], kernel[c:]
    proj_nbr = x @ w_nbr
    proj_ctr = x @ (w_ctr - w_nbr)
    b, n, k = idx.shape[0], idx.shape[1], idx.shape[2]
    gathered = torch.stack(
        [proj_nbr[bb][idx[bb].reshape(-1)].reshape(n, k, -1)
         for bb in range(b)]
    )
    e = gathered + proj_ctr[:, :, None, :]
    e = torch_bn(e, stats["bn"], params["bn"])
    return torch.relu(e).max(dim=2).values


def test_lpd_edge_bn_placement_parity(rng):
    """edge_bn_placement='edge' end-to-end vs the per-edge torch oracle."""
    from test_torch_parity import torch_knn

    N = 128
    cfg = ModelConfig(
        trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, compute_features_on_device=False,
        input_dim=13, edge_bn_placement="edge",
        features=FeatureConfig(k=6, knn_block=64),
    )
    model, variables = init_model(cfg, jax.random.key(5), batch_size=2)
    x_warm = jnp.asarray(rng.randn(4, N, 13).astype(np.float32))
    _, mutated = model.apply(
        variables, x_warm, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mutated["batch_stats"]}

    x = (rng.rand(2, N, 13).astype(np.float32) - 0.5) * 2.0
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    tree = to_pytree(variables)
    params, stats = tree["params"]["trunk"], tree["batch_stats"]["trunk"]
    xt = t(x)
    h = torch_point_mlp(xt, params["pre"], stats["pre"])
    idx = torch_knn(xt[..., :3], cfg.graph_k)
    h = torch_edge_conv_edge(
        h, idx, params["edge_spatial"], stats["edge_spatial"]
    )
    idx2 = torch_knn(h, cfg.graph_k)
    h = torch_edge_conv_edge(
        h, idx2, params["edge_feature"], stats["edge_feature"]
    )
    h = torch_point_mlp(h, params["post"], stats["post"], relu_last=False)
    theirs = torch_netvlad(
        h, tree["params"]["netvlad"], tree["batch_stats"]["netvlad"],
        cfg.add_batch_norm, cfg.gating, cfg.post_projection_bn,
    )
    theirs = theirs / torch.sqrt((theirs**2).sum(-1, keepdim=True) + 1e-12)
    cos = (ours * theirs.numpy()).sum(-1)
    np.testing.assert_array_less(1.0 - 1e-3, cos)
