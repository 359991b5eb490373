"""Torch state_dict importer (VERDICT round 1, item 10): an upstream-style
torch module — real nn.Conv1d/Conv2d/BatchNorm/Parameter modules named per
the PointNetVlad-Pytorch lineage (SURVEY C10-C13) — is randomly initialized,
its ``state_dict()`` imported, and the Flax model must reproduce the torch
module's own descriptors. This validates every risky transform: conv-weight
layouts, bias-into-BN folding, the STN identity offset, cluster_weights2
transposition, and the VLAD flatten-order permutation of hidden1_weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from lpdnet_tpu.configs import FeatureConfig, ModelConfig  # noqa: E402
from lpdnet_tpu.models.model import init_model  # noqa: E402
from lpdnet_tpu.utils.import_torch import import_state_dict  # noqa: E402

N = 128


class TorchSTN3d(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv1d(3, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, 9)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.bn4 = nn.BatchNorm1d(512)
        self.bn5 = nn.BatchNorm1d(256)

    def forward(self, x):  # (B, N, 3) -> (B, 3, 3)
        h = x.transpose(1, 2)  # (B, 3, N)
        h = F.relu(self.bn1(self.conv1(h)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        h = h.max(dim=-1).values
        h = F.relu(self.bn4(self.fc1(h)))
        h = F.relu(self.bn5(self.fc2(h)))
        h = self.fc3(h)
        iden = torch.eye(3, device=h.device).reshape(1, 9)
        return (h + iden).reshape(-1, 3, 3)


class TorchPointNetTrunk(nn.Module):
    """point_net: STN + shared convs (conv1..conv5 / bn1..bn5)."""

    def __init__(self, feature_dim=64):
        super().__init__()
        self.stn = TorchSTN3d()
        self.conv1 = nn.Conv2d(1, 64, (1, 3))
        self.conv2 = nn.Conv2d(64, 64, (1, 1))
        self.conv3 = nn.Conv2d(64, 64, (1, 1))
        self.conv4 = nn.Conv2d(64, 128, (1, 1))
        self.conv5 = nn.Conv2d(128, feature_dim, (1, 1))
        self.bn1 = nn.BatchNorm2d(64)
        self.bn2 = nn.BatchNorm2d(64)
        self.bn3 = nn.BatchNorm2d(64)
        self.bn4 = nn.BatchNorm2d(128)
        self.bn5 = nn.BatchNorm2d(feature_dim)

    def forward(self, x):  # (B, N, 3) -> (B, N, D)
        trans = self.stn(x)
        x = torch.bmm(x, trans)
        h = x[:, None]  # (B, 1, N, 3)
        h = F.relu(self.bn1(self.conv1(h)))  # (B, 64, N, 1)
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        h = F.relu(self.bn4(self.conv4(h)))
        h = self.bn5(self.conv5(h))  # linear-after-BN, as the flax trunk
        return h[..., 0].transpose(1, 2)  # (B, N, D)


class TorchGatingContext(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gating_weights = nn.Parameter(torch.randn(dim, dim) * 0.1)
        self.bn1 = nn.BatchNorm1d(dim)

    def forward(self, x):
        gates = self.bn1(x @ self.gating_weights)
        return x * torch.sigmoid(gates)


class TorchNetVLADLoupe(nn.Module):
    """Upstream flatten order: (B, D, K) row-major (index d*K + k)."""

    def __init__(self, d, k, out):
        super().__init__()
        self.d, self.k, self.out = d, k, out
        self.cluster_weights = nn.Parameter(torch.randn(d, k) * 0.1)
        self.cluster_weights2 = nn.Parameter(torch.randn(1, d, k) * 0.1)
        self.hidden1_weights = nn.Parameter(torch.randn(d * k, out) * 0.1)
        self.bn1 = nn.BatchNorm1d(k)
        self.bn2 = nn.BatchNorm1d(out)
        self.context_gating = TorchGatingContext(out)

    def forward(self, x):  # (B, N, D)
        b, n, d = x.shape
        logits = x.reshape(-1, d) @ self.cluster_weights  # (B*N, K)
        a = torch.softmax(self.bn1(logits).reshape(b, n, self.k), dim=-1)
        a_sum = a.sum(dim=1, keepdim=True)  # (B, 1, K)
        centers = a_sum * self.cluster_weights2  # (B, D, K)
        vlad = torch.matmul(a.transpose(1, 2), x)  # (B, K, D)
        vlad = vlad.transpose(1, 2) - centers  # (B, D, K)
        vlad = F.normalize(vlad, dim=1, p=2)  # intra-norm over D
        flat = vlad.reshape(b, self.d * self.k)  # index = d*K + k
        flat = F.normalize(flat, dim=1, p=2)
        out = self.bn2(flat @ self.hidden1_weights)
        return self.context_gating(out)


class TorchPointNetVlad(nn.Module):
    def __init__(self, feature_dim=64, clusters=8, out=32):
        super().__init__()
        self.point_net = TorchPointNetTrunk(feature_dim)
        self.net_vlad = TorchNetVLADLoupe(feature_dim, clusters, out)

    def forward(self, x):
        desc = self.net_vlad(self.point_net(x))
        return F.normalize(desc, dim=1, p=2)


def _warm_bn(module, rng, shape, passes=3):
    module.train()
    with torch.no_grad():
        for _ in range(passes):
            module(torch.from_numpy(
                rng.randn(*shape).astype(np.float32)
            ))
    module.eval()


@pytest.mark.slow
def test_pointnetvlad_state_dict_import(rng):
    # Slow lane since round 5's third hygiene pass: the LPD import below is
    # the default-lane representative (flagship trunk, strictly more mapping
    # surface — the baseline-trunk table is a subset of it).
    torch.manual_seed(0)
    ref = TorchPointNetVlad()
    _warm_bn(ref, rng, (4, N, 3))

    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, use_input_transform=True,
    )
    variables = import_state_dict(ref.state_dict(), cfg)

    x = rng.randn(2, N, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model, _ = init_model(cfg, jax.random.key(0), batch_size=1)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    cos = (got * want).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_import_rejects_wrong_shapes_and_leftovers(rng):
    torch.manual_seed(0)
    ref = TorchPointNetVlad()
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32,
    )
    sd = ref.state_dict()
    sd["stray.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        import_state_dict(sd, cfg)

    sd = ref.state_dict()
    sd["net_vlad.cluster_weights"] = torch.zeros(7, 8)
    with pytest.raises(ValueError, match="shape"):
        import_state_dict(sd, cfg)


class TorchEdgeConv(nn.Module):
    """DGCNN-style: conv on [x_j - x_i, x_i] edges, BN2d, relu, max over k."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(2 * cin, cout, 1)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x, idx):  # x (B, N, C), idx (B, N, k)
        b, n, c = x.shape
        k = idx.shape[-1]
        nbrs = torch.stack(
            [x[i][idx[i].reshape(-1)].reshape(n, k, c) for i in range(b)]
        )
        ctr = x[:, :, None].expand(-1, -1, k, -1)
        e = torch.cat([nbrs - ctr, ctr], dim=-1)  # (B, N, k, 2C)
        e = e.permute(0, 3, 1, 2)  # (B, 2C, N, k)
        h = F.relu(self.bn(self.conv(e)))
        return h.max(dim=-1).values.transpose(1, 2)  # (B, N, cout)


class TorchMLPBlock(nn.Module):
    def __init__(self, widths):
        super().__init__()
        for i, (cin, cout) in enumerate(zip(widths[:-1], widths[1:])):
            setattr(self, f"conv{i + 1}", nn.Conv1d(cin, cout, 1))
            setattr(self, f"bn{i + 1}", nn.BatchNorm1d(cout))
        self.n = len(widths) - 1

    def forward(self, x, relu_last=True):  # (B, N, C)
        h = x.transpose(1, 2)
        for i in range(self.n):
            h = getattr(self, f"bn{i + 1}")(getattr(self, f"conv{i + 1}")(h))
            if i + 1 < self.n or relu_last:
                h = F.relu(h)
        return h.transpose(1, 2)


class TorchLPDTrunk(nn.Module):
    """Canonical-name LPD feature net (placeholder names — empty mount)."""

    def __init__(self, k=6, feature_dim=64):
        super().__init__()
        self.k = k
        self.pre = TorchMLPBlock([13, 64, 64])
        self.edge_spatial = TorchEdgeConv(64, 64)
        self.edge_feature = TorchEdgeConv(64, 128)
        self.post = TorchMLPBlock([128, 256, feature_dim])

    @staticmethod
    def knn(x, k):
        d = torch.cdist(x, x) ** 2
        return d.topk(k, largest=False).indices

    def forward(self, x13):
        h = self.pre(x13)
        h = self.edge_spatial(h, self.knn(x13[..., :3], self.k))
        h = self.edge_feature(h, self.knn(h, self.k))
        return self.post(h, relu_last=False)


class TorchLPDNetVlad(nn.Module):
    def __init__(self):
        super().__init__()
        self.point_net = TorchLPDTrunk()
        self.net_vlad = TorchNetVLADLoupe(64, 8, 32)

    def forward(self, x13):
        return F.normalize(self.net_vlad(self.point_net(x13)), dim=1, p=2)


@pytest.mark.slow
def test_evaluate_cli_with_torch_checkpoint(rng, tmp_path):
    """End-to-end surface: evaluate.py --torch_checkpoint imports a saved
    reference-style checkpoint (with the {'epoch','state_dict','optimizer'}
    wrapper and DataParallel 'module.' prefixes) and runs the benchmark."""
    import os
    import subprocess
    import sys

    from lpdnet_tpu.configs import Config, ModelConfig
    from lpdnet_tpu.utils.checkpoint import save_config

    torch.manual_seed(2)
    ref = TorchPointNetVlad(feature_dim=64, clusters=8, out=32)
    _warm_bn(ref, rng, (4, 256, 3))
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    ckpt_path = str(tmp_path / "model.ckpt")
    torch.save({"epoch": 7, "state_dict": sd, "optimizer": {}}, ckpt_path)

    log_dir = str(tmp_path / "log")
    cfg = Config(
        model=ModelConfig(
            trunk="pointnetvlad", num_points=256, feature_dim=64,
            num_clusters=8, output_dim=32, use_input_transform=True,
        ),
    )
    save_config(cfg, log_dir)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "evaluate.py", "--synthetic", "--no_mesh",
         "--log_dir", log_dir, "--torch_checkpoint", ckpt_path],
        cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-2000:])
    assert "imported torch checkpoint" in proc.stdout
    assert "Average Top 1% Recall:" in proc.stdout


def test_lpd_state_dict_import(rng):
    torch.manual_seed(1)
    ref = TorchLPDNetVlad()
    _warm_bn(ref, rng, (4, N, 13))

    cfg = ModelConfig(
        trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, compute_features_on_device=False,
        input_dim=13, edge_bn_placement="edge",
        features=FeatureConfig(k=6, knn_block=64),
    )
    variables = import_state_dict(ref.state_dict(), cfg)

    x = (rng.rand(2, N, 13).astype(np.float32) - 0.5) * 2.0
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model, _ = init_model(cfg, jax.random.key(0), batch_size=1)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    # kNN tie permutations may swap a few neighbours across frameworks.
    cos = (got * want).sum(-1)
    np.testing.assert_array_less(1.0 - 1e-3, cos)


def _tree_allclose(a, b, atol=1e-6):
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=atol,
            err_msg=str(path),
        )


@pytest.mark.parametrize("trunk", ["pointnetvlad", "lpdnet"])
def test_export_import_roundtrip(rng, trunk):
    """export_state_dict is import_state_dict's exact inverse (VERDICT
    round-2 item 5: the docstring's promised exporter)."""
    from lpdnet_tpu.utils.import_torch import export_state_dict

    cfg = ModelConfig(
        trunk=trunk, num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6,
        **(
            {"compute_features_on_device": False, "input_dim": 13,
             "edge_bn_placement": "edge",
             "features": FeatureConfig(k=6, knn_block=64)}
            if trunk == "lpdnet" else {"use_input_transform": True}
        ),
    )
    _, variables = init_model(cfg, jax.random.key(7), batch_size=1)
    sd = export_state_dict(variables, cfg)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    back = import_state_dict(sd, cfg, shape_fallback=False)
    _tree_allclose(back, variables)


def test_shape_fallback_imports_renamed_checkpoint(rng):
    """A checkpoint with upstream-lineage structure but different module
    names imports via the (kind, shape, topological position) remapper
    (VERDICT round-2 item 5)."""
    torch.manual_seed(3)
    ref = TorchPointNetVlad()
    _warm_bn(ref, rng, (4, N, 3))

    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, use_input_transform=True,
    )
    # Rename every module as a different framework port might.
    renames = {
        "point_net.": "backbone.encoder.",
        "net_vlad.": "aggregator.",
        ".stn.": ".alignment.",
        "conv": "pointwise",
        "fc": "linear",
        "bn": "norm",
    }
    sd = {}
    for key, val in ref.state_dict().items():
        for old, new in renames.items():
            key = key.replace(old, new)
        sd[key] = val
    with pytest.raises(KeyError):
        import_state_dict(sd, cfg, shape_fallback=False)
    variables = import_state_dict(sd, cfg)  # shape fallback on by default

    x = rng.randn(2, N, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    model, _ = init_model(cfg, jax.random.key(0), batch_size=1)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_shape_fallback_rejects_different_architecture(rng):
    """Shape mismatches mean a different model, not a renaming — the
    remapper must fail loudly, not misassign."""
    torch.manual_seed(4)
    ref = TorchPointNetVlad()
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=128,  # wrong width
        num_clusters=8, output_dim=32, use_input_transform=True,
    )
    sd = {f"renamed.{k}": v for k, v in ref.state_dict().items()}
    with pytest.raises(ValueError, match="shape-fallback"):
        import_state_dict(sd, cfg)
