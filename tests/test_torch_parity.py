"""Cross-framework descriptor parity: a literal CPU-torch transcription of
the architecture (the reference's implementation framework), fed the SAME
weights, must produce the same descriptors (SURVEY §4 "parity tests").

The reference mount was empty during the survey (SURVEY provenance note),
so this oracle transcribes the behavioral spec of SURVEY C10-C13 — shared
MLP trunk + NetVLAD-Loupe head — rather than diffing against reference
source. It still catches what the parity test exists to catch: framework-
level numeric divergence (BN semantics, softmax, normalization order,
matmul layouts) between the torch world and our XLA world.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402 (after importorskip)

from lpdnet_tpu.configs import FeatureConfig, ModelConfig
from lpdnet_tpu.models.model import init_model

N = 128


def t(x):
    return torch.from_numpy(np.array(x, dtype=np.float32))  # copy: torch rejects read-only jax buffers


def torch_bn(x, stats, params, eps=1e-5):
    """Inference BatchNorm over the last axis (flax layout)."""
    mean, var = t(stats["mean"]), t(stats["var"])
    scale, bias = t(params["scale"]), t(params["bias"])
    return (x - mean) / torch.sqrt(var + eps) * scale + bias


def torch_point_mlp(x, params, stats, relu_last=True):
    n_layers = len([k for k in params if k.startswith("dense_")])
    for i in range(n_layers):
        x = x @ t(params[f"dense_{i}"]["kernel"])
        x = torch_bn(x, stats[f"bn_{i}"], params[f"bn_{i}"])
        if i + 1 < n_layers or relu_last:
            x = torch.relu(x)
    return x


def torch_stn(x, params, stats, k=3):
    h = torch_point_mlp(x, params["PointMLP_0"], stats["PointMLP_0"])
    h = h.max(dim=1).values
    for i in range(2):
        h = h @ t(params[f"fc_{i}"]["kernel"])
        h = torch_bn(h, stats[f"fc_bn_{i}"], params[f"fc_bn_{i}"])
        h = torch.relu(h)
    h = h @ t(params["fc_out"]["kernel"]) + t(params["fc_out"]["bias"])
    return h.reshape(-1, k, k)


def torch_pointnet_trunk(x, params, stats, use_input_transform=True):
    if use_input_transform:
        trans = torch_stn(x, params["stn"], stats["stn"])
        x = torch.bmm(x, trans)
    x = torch_point_mlp(x, params["mlp1"], stats["mlp1"])
    x = torch_point_mlp(x, params["mlp2"], stats["mlp2"], relu_last=False)
    return x


def torch_netvlad(x, params, stats, add_batch_norm=True, gating=True,
                  post_projection_bn=True, eps=1e-12):
    logits = x @ t(params["cluster_weights"]["kernel"])
    if add_batch_norm:
        logits = torch_bn(logits, stats["cluster_bn"], params["cluster_bn"])
    else:
        logits = logits + t(params["cluster_weights"]["bias"])
    a = torch.softmax(logits, dim=-1)  # (B, N, K)
    centers = t(params["cluster_centers"])  # (K, D)
    vlad = torch.einsum("bnk,bnd->bkd", a, x)
    vlad = vlad - a.sum(dim=1)[..., None] * centers[None]
    vlad = vlad / torch.sqrt((vlad**2).sum(-1, keepdim=True) + eps)
    flat = vlad.reshape(x.shape[0], -1)
    flat = flat / torch.sqrt((flat**2).sum(-1, keepdim=True) + eps)
    out = flat @ t(params["hidden1_weights"]["kernel"])
    if post_projection_bn:
        # Reference bn2: unconditional BN on the projection (no Dense bias).
        out = torch_bn(out, stats["hidden1_bn"], params["hidden1_bn"])
    else:
        out = out + t(params["hidden1_weights"]["bias"])
    if gating:
        g = params["context_gating"]
        gates = out @ t(g["gating_weights"]["kernel"])
        if add_batch_norm:
            gates = torch_bn(gates, stats["context_gating"]["gating_bn"],
                             g["gating_bn"])
        else:
            gates = gates + t(g["gating_weights"]["bias"])
        out = out * torch.sigmoid(gates)
    return out


def torch_descriptor(x, variables, cfg):
    params = variables["params"]
    stats = variables["batch_stats"]
    trunk = torch_pointnet_trunk(
        x, params["trunk"], stats["trunk"], cfg.use_input_transform
    )
    out = torch_netvlad(
        trunk, params["netvlad"], stats.get("netvlad", {}),
        cfg.add_batch_norm, cfg.gating, cfg.post_projection_bn,
    )
    if cfg.normalize_output:
        out = out / torch.sqrt((out**2).sum(-1, keepdim=True) + 1e-12)
    return out


def to_pytree(variables):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(variables))


def test_pointnetvlad_descriptor_parity(rng):
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64,
        num_clusters=8, output_dim=32, use_input_transform=True,
    )
    model, variables = init_model(cfg, jax.random.key(42), batch_size=2)
    # Nonzero BN stats so the oracle exercises real normalization: run a
    # train-mode pass first.
    x_warm = jnp.asarray(rng.randn(4, N, 3).astype(np.float32))
    _, mutated = model.apply(
        variables, x_warm, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mutated["batch_stats"]}

    x = rng.randn(2, N, 3).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    theirs = torch_descriptor(t(x), to_pytree(variables), cfg).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
    cos = (ours * theirs).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def torch_edge_conv(x, idx, params, stats):
    """Decomposed EdgeConv with post-aggregation BN (our 'post' design):
    relu(bn(max_j(W1 x_j) + (W2 - W1) x_i))."""
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
    agg = gathered.max(dim=2).values
    return torch.relu(torch_bn(agg + proj_ctr, stats["bn"], params["bn"]))


def torch_knn(x, k):
    d = torch.cdist(x, x) ** 2
    return d.topk(k, largest=False).indices


def torch_lpd_trunk(x13, params, stats, k):
    xyz = x13[..., :3]
    h = torch_point_mlp(x13, params["pre"], stats["pre"])
    idx = torch_knn(xyz, k)
    h = torch_edge_conv(h, idx, params["edge_spatial"], stats["edge_spatial"])
    idx2 = torch_knn(h, k)
    h = torch_edge_conv(h, idx2, params["edge_feature"], stats["edge_feature"])
    return torch_point_mlp(h, params["post"], stats["post"], relu_last=False)


def test_lpd_trunk_descriptor_parity(rng):
    cfg = ModelConfig(
        trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, compute_features_on_device=False,
        # The torch oracle is the hard-max gather; pin max ('auto'
        # resolves to lse since round 4).
        aggregation="max",
        input_dim=13, features=FeatureConfig(k=6, knn_block=64),
    )
    model, variables = init_model(cfg, jax.random.key(3), batch_size=2)
    x_warm = jnp.asarray(rng.randn(4, N, 13).astype(np.float32))
    _, mutated = model.apply(
        variables, x_warm, train=True, mutable=["batch_stats"]
    )
    variables = {**variables, "batch_stats": mutated["batch_stats"]}

    # Spread points to avoid kNN ties between frameworks.
    x = (rng.rand(2, N, 13).astype(np.float32) - 0.5) * 2.0
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    tree = to_pytree(variables)
    trunk = torch_lpd_trunk(
        t(x), tree["params"]["trunk"], tree["batch_stats"]["trunk"], 6
    )
    theirs = torch_netvlad(
        trunk, tree["params"]["netvlad"],
        tree["batch_stats"].get("netvlad", {}),
        cfg.add_batch_norm, cfg.gating, cfg.post_projection_bn,
    )
    theirs = theirs / torch.sqrt((theirs**2).sum(-1, keepdim=True) + 1e-12)
    theirs = theirs.numpy()
    cos = (ours * theirs).sum(-1)
    # kNN tie permutations can swap a few neighbours; descriptors must
    # still agree to high cosine.
    np.testing.assert_allclose(cos, 1.0, atol=1e-3)


def test_netvlad_head_parity_no_gating(rng):
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64,
        num_clusters=8, output_dim=32, use_input_transform=False,
        gating=False, add_batch_norm=False,
    )
    model, variables = init_model(cfg, jax.random.key(7), batch_size=2)
    x = rng.randn(2, N, 3).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    theirs = torch_descriptor(t(x), to_pytree(variables), cfg).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
