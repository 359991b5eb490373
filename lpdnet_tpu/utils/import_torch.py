"""Torch state_dict -> Flax variables importer (and exporter).

The retrieval-fidelity north star requires diffing descriptors against a
trained reference checkpoint (BASELINE.json ``north_star``), which means a
reference ``torch.save``d ``state_dict`` must load into this framework's
parameter tree. The mount of the reference repo was EMPTY in both survey
sessions, so the torch-side names below follow the upstream
PointNetVlad-Pytorch lineage the reference builds on (SURVEY C10-C13,
provenance [K]): ``point_net.*`` (STN3d + shared-conv trunk) and
``net_vlad.*`` (NetVLADLoupe + GatingContext). When the real repo becomes
readable, only the name table needs updating — the shape transforms are
layout facts of the two frameworks, validated by
``tests/test_import_torch.py`` against a live upstream-style torch module.

Conventions handled:
  * Conv1d/Conv2d shared "convs" -> Dense kernels ((out, in, 1[, 1]) or
    (out, 1, 1, in) -> (in, out));
  * conv/linear biases folded into the following BatchNorm's running mean
    (our Dense layers are bias-free because BN absorbs the bias exactly);
  * NetVLAD ``cluster_weights2`` (1, D, K) -> centers (K, D);
  * the VLAD flatten order: upstream flattens (B, D, K) row-major
    (index d*K + k), we flatten (B, K, D) (index k*D + d) — the output
    projection's rows are permuted accordingly;
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from lpdnet_tpu.configs import ModelConfig

Path = Tuple[str, ...]


def _conv_to_kernel(w: np.ndarray) -> np.ndarray:
    """Torch conv weight -> Dense kernel (in, out).

    Handles Conv1d (out, in, 1), Conv2d (out, in, 1, 1), and the
    first-layer Conv2d(1, out, (1, C)) with weight (out, 1, 1, C).
    """
    w = np.asarray(w, np.float32)
    if w.ndim > 2:
        w = w.reshape(w.shape[0], -1)
    return np.ascontiguousarray(w.T)


def _linear_to_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


class _TreeWriter:
    """Accumulates leaf assignments into {params, batch_stats} trees and
    validates shapes against the model's initialized tree."""

    def __init__(self, variables: Dict[str, Any]):
        import jax

        self.tree = jax.tree_util.tree_map(np.asarray, variables)
        self.tree = _to_mutable(self.tree)
        self.written: List[Path] = []

    def set(self, path: Path, value: np.ndarray) -> None:
        node = self.tree
        for p in path[:-1]:
            if p not in node:
                raise KeyError(f"no such module path: {'/'.join(path)}")
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            raise KeyError(f"no such parameter: {'/'.join(path)}")
        value = np.asarray(value, np.float32)
        if node[leaf].shape != value.shape:
            raise ValueError(
                f"{'/'.join(path)}: shape {value.shape} != expected "
                f"{node[leaf].shape}"
            )
        node[leaf] = value
        self.written.append(path)


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


# ---------------------------------------------------------------------------
# Mapping rules: each rule consumes torch keys and writes flax leaves.
# ---------------------------------------------------------------------------


def _rule_conv_bn(src: str, bn: str, params: Path, stats: Path):
    """conv/linear (+optional bias) followed by BatchNorm -> bias-free
    Dense kernel + BN scale/bias/mean/var with the bias folded into the
    running mean (exact: BN(Wx + b) == BN'(Wx) with mean' = mean - b)."""

    def apply(sd, w: _TreeWriter, to_kernel):
        weight = to_kernel(sd.pop(f"{src}.weight"))
        bias = sd.pop(f"{src}.bias", None)
        w.set(params + ("kernel",), weight)
        mean = np.asarray(sd.pop(f"{bn}.running_mean"), np.float32)
        if bias is not None:
            mean = mean - np.asarray(bias, np.float32)
        w.set(stats + ("mean",), mean)
        w.set(stats + ("var",), sd.pop(f"{bn}.running_var"))
        w.set(params[:-1] + (stats[-1], "scale"), sd.pop(f"{bn}.weight"))
        w.set(params[:-1] + (stats[-1], "bias"), sd.pop(f"{bn}.bias"))
        sd.pop(f"{bn}.num_batches_tracked", None)

    return apply


def _import_point_mlp(sd, w, torch_convs, torch_bns, flax_base: Path,
                      stats_base: Path, to_kernel=_conv_to_kernel):
    for i, (c, b) in enumerate(zip(torch_convs, torch_bns)):
        _rule_conv_bn(
            c, b,
            flax_base + (f"dense_{i}", ),
            stats_base + (f"bn_{i}",),
        )(sd, w, to_kernel)


def _import_bn(sd, w, src: str, params: Path, stats: Path):
    w.set(params + ("scale",), sd.pop(f"{src}.weight"))
    w.set(params + ("bias",), sd.pop(f"{src}.bias"))
    w.set(stats + ("mean",), sd.pop(f"{src}.running_mean"))
    w.set(stats + ("var",), sd.pop(f"{src}.running_var"))
    sd.pop(f"{src}.num_batches_tracked", None)


def import_state_dict(
    state_dict: Dict[str, Any],
    cfg: ModelConfig,
    variables: Optional[Dict[str, Any]] = None,
    trunk_prefix: str = "point_net.",
    head_prefix: str = "net_vlad.",
    strict: bool = True,
    shape_fallback: bool = True,
) -> Dict[str, Any]:
    """Convert a reference-style torch ``state_dict`` into Flax variables.

    Args:
      state_dict: name -> tensor/ndarray (torch tensors accepted).
      cfg: the model configuration the checkpoint belongs to.
      variables: optionally, an initialized variable tree to validate
        against (built fresh via ``init_model`` when omitted).
      trunk_prefix/head_prefix: torch module prefixes (upstream lineage
        defaults; override when the real reference names differ).
      strict: raise if any torch key is left unconsumed.
      shape_fallback: when a name-table lookup misses (an upstream-lineage
        checkpoint with different module names), retry after remapping the
        torch modules onto the canonical names by (kind, tensor shapes,
        topological position) — see :func:`remap_state_dict_by_shape`.

    Returns:
      ``{"params": ..., "batch_stats": ...}`` ready for ``model.apply``.
    """
    import jax

    from lpdnet_tpu.models.model import init_model

    if variables is None:
        _, variables = init_model(cfg, jax.random.key(0), batch_size=1)

    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    try:
        return _import_named(
            dict(sd), cfg, variables, trunk_prefix, head_prefix, strict
        )
    except KeyError:
        if not shape_fallback:
            raise
        renamed = remap_state_dict_by_shape(
            sd, cfg, trunk_prefix=trunk_prefix, head_prefix=head_prefix
        )
        return _import_named(
            renamed, cfg, variables, trunk_prefix, head_prefix, strict
        )


def _import_named(
    sd: Dict[str, np.ndarray],
    cfg: ModelConfig,
    variables: Dict[str, Any],
    trunk_prefix: str,
    head_prefix: str,
    strict: bool,
) -> Dict[str, Any]:
    w = _TreeWriter(variables)
    tp, hp = trunk_prefix, head_prefix

    if cfg.trunk == "pointnetvlad":
        if cfg.use_input_transform:
            s = f"{tp}stn"
            _import_point_mlp(
                sd, w,
                [f"{s}.conv{i}" for i in (1, 2, 3)],
                [f"{s}.bn{i}" for i in (1, 2, 3)],
                ("params", "trunk", "stn", "PointMLP_0"),
                ("batch_stats", "trunk", "stn", "PointMLP_0"),
            )
            for i, (fc, bn) in enumerate(
                [(f"{s}.fc1", f"{s}.bn4"), (f"{s}.fc2", f"{s}.bn5")]
            ):
                _rule_conv_bn(
                    fc, bn,
                    ("params", "trunk", "stn", f"fc_{i}"),
                    ("batch_stats", "trunk", "stn", f"fc_bn_{i}"),
                )(sd, w, _linear_to_kernel)
            w.set(
                ("params", "trunk", "stn", "fc_out", "kernel"),
                _linear_to_kernel(sd.pop(f"{s}.fc3.weight")),
            )
            # Upstream adds the identity in forward (x = fc3(x) + iden);
            # our STN bakes it into the output bias — fold it in here.
            w.set(
                ("params", "trunk", "stn", "fc_out", "bias"),
                np.asarray(sd.pop(f"{s}.fc3.bias"), np.float32)
                + np.eye(3, dtype=np.float32).reshape(-1),
            )
        # Shared trunk convs 1-2 -> mlp1, 3-5 -> mlp2.
        _import_point_mlp(
            sd, w,
            [f"{tp}conv{i}" for i in (1, 2)],
            [f"{tp}bn{i}" for i in (1, 2)],
            ("params", "trunk", "mlp1"), ("batch_stats", "trunk", "mlp1"),
        )
        _import_point_mlp(
            sd, w,
            [f"{tp}conv{i}" for i in (3, 4, 5)],
            [f"{tp}bn{i}" for i in (3, 4, 5)],
            ("params", "trunk", "mlp2"), ("batch_stats", "trunk", "mlp2"),
        )
    elif cfg.trunk == "lpdnet":
        # Placeholder canonical names for the LPD feature net (the exact
        # reference module/file names are unverified — empty mount; SURVEY
        # C11). Layout mirrors our exporter: pre.conv{i}/bn{i},
        # edge_{spatial,feature}.conv/bn, post.conv{i}/bn{i}.
        _import_point_mlp(
            sd, w,
            [f"{tp}pre.conv{i}" for i in (1, 2)],
            [f"{tp}pre.bn{i}" for i in (1, 2)],
            ("params", "trunk", "pre"), ("batch_stats", "trunk", "pre"),
        )
        for name in ("edge_spatial", "edge_feature"):
            # DGCNN edge conv weight (width, 2C, 1, 1) on [x_j - x_i, x_i]
            # edges -> our (2C, width) kernel (same row split).
            w.set(
                ("params", "trunk", name, "kernel"),
                _conv_to_kernel(sd.pop(f"{tp}{name}.conv.weight")),
            )
            bias = sd.pop(f"{tp}{name}.conv.bias", None)
            mean = np.asarray(
                sd.pop(f"{tp}{name}.bn.running_mean"), np.float32
            )
            if bias is not None:
                mean = mean - np.asarray(bias, np.float32)
            w.set(("batch_stats", "trunk", name, "bn", "mean"), mean)
            w.set(
                ("batch_stats", "trunk", name, "bn", "var"),
                sd.pop(f"{tp}{name}.bn.running_var"),
            )
            w.set(
                ("params", "trunk", name, "bn", "scale"),
                sd.pop(f"{tp}{name}.bn.weight"),
            )
            w.set(
                ("params", "trunk", name, "bn", "bias"),
                sd.pop(f"{tp}{name}.bn.bias"),
            )
            sd.pop(f"{tp}{name}.bn.num_batches_tracked", None)
        n_post = len(
            {
                k[len(f"{tp}post."):].split(".")[0]
                for k in sd
                if k.startswith(f"{tp}post.conv")
            }
        )
        _import_point_mlp(
            sd, w,
            [f"{tp}post.conv{i + 1}" for i in range(n_post)],
            [f"{tp}post.bn{i + 1}" for i in range(n_post)],
            ("params", "trunk", "post"), ("batch_stats", "trunk", "post"),
        )
    else:
        raise ValueError(f"unknown trunk: {cfg.trunk!r}")

    # NetVLAD head (SURVEY C12).
    d, k = cfg.feature_dim, cfg.num_clusters
    w.set(
        ("params", "netvlad", "cluster_weights", "kernel"),
        np.asarray(sd.pop(f"{hp}cluster_weights"), np.float32),
    )
    if cfg.add_batch_norm:
        _import_bn(
            sd, w, f"{hp}bn1",
            ("params", "netvlad", "cluster_bn"),
            ("batch_stats", "netvlad", "cluster_bn"),
        )
    else:
        w.set(
            ("params", "netvlad", "cluster_weights", "bias"),
            np.asarray(sd.pop(f"{hp}cluster_biases"), np.float32).reshape(-1),
        )
    w.set(
        ("params", "netvlad", "cluster_centers"),
        np.ascontiguousarray(
            np.asarray(sd.pop(f"{hp}cluster_weights2"), np.float32)[0].T
        ),
    )
    # Upstream flattens the (B, D, K) VLAD matrix row-major (index d*K + k);
    # we flatten (B, K, D) (index k*D + d): permute the projection's rows.
    h1 = np.asarray(sd.pop(f"{hp}hidden1_weights"), np.float32)
    h1 = h1.reshape(d, k, cfg.output_dim).transpose(1, 0, 2).reshape(
        k * d, cfg.output_dim
    )
    w.set(("params", "netvlad", "hidden1_weights", "kernel"), h1)
    if cfg.post_projection_bn:
        _import_bn(
            sd, w, f"{hp}bn2",
            ("params", "netvlad", "hidden1_bn"),
            ("batch_stats", "netvlad", "hidden1_bn"),
        )
    if cfg.gating:
        g = f"{hp}context_gating"
        w.set(
            ("params", "netvlad", "context_gating", "gating_weights",
             "kernel"),
            np.asarray(sd.pop(f"{g}.gating_weights"), np.float32),
        )
        if cfg.add_batch_norm:
            _import_bn(
                sd, w, f"{g}.bn1",
                ("params", "netvlad", "context_gating", "gating_bn"),
                ("batch_stats", "netvlad", "context_gating", "gating_bn"),
            )
        else:
            w.set(
                ("params", "netvlad", "context_gating", "gating_weights",
                 "bias"),
                np.asarray(
                    sd.pop(f"{g}.gating_biases"), np.float32
                ).reshape(-1),
            )

    if strict and sd:
        raise ValueError(
            f"unconsumed torch keys ({len(sd)}): {sorted(sd)[:8]} ..."
        )
    return w.tree


# ---------------------------------------------------------------------------
# Exporter: Flax variables -> upstream-style torch state_dict (the inverse
# of the importer; canonical Conv1d (out, in, 1) weights). Enables
# flax -> torch -> flax round-trips and interop with reference-side tools.
# ---------------------------------------------------------------------------


def _kernel_to_conv(kernel: np.ndarray) -> np.ndarray:
    """Dense kernel (in, out) -> canonical Conv1d weight (out, in, 1)."""
    return np.ascontiguousarray(
        np.asarray(kernel, np.float32).T
    )[:, :, None]


def _kernel_to_linear(kernel: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(kernel, np.float32).T)


def export_state_dict(
    variables: Dict[str, Any],
    cfg: ModelConfig,
    trunk_prefix: str = "point_net.",
    head_prefix: str = "net_vlad.",
) -> Dict[str, np.ndarray]:
    """Flax ``{"params", "batch_stats"}`` -> torch-style state_dict in the
    upstream naming (``import_state_dict``'s exact inverse — round-trip
    tested). Keys are emitted in forward (topological) order; that order is
    what the shape-fallback remapper uses as its canonical slot list."""
    import jax

    tree = _to_mutable(jax.tree_util.tree_map(np.asarray, variables))
    p, s = tree["params"], tree["batch_stats"]
    tp, hp = trunk_prefix, head_prefix
    out: Dict[str, np.ndarray] = {}

    def put_bn(dst: str, scale_node, stats_node) -> None:
        out[f"{dst}.weight"] = np.asarray(scale_node["scale"], np.float32)
        out[f"{dst}.bias"] = np.asarray(scale_node["bias"], np.float32)
        out[f"{dst}.running_mean"] = np.asarray(
            stats_node["mean"], np.float32
        )
        out[f"{dst}.running_var"] = np.asarray(stats_node["var"], np.float32)

    def put_mlp(p_node, s_node, convs, bns, dense="dense", bn="bn",
                to_conv=_kernel_to_conv) -> None:
        for i, (c, b) in enumerate(zip(convs, bns)):
            out[f"{c}.weight"] = to_conv(p_node[f"{dense}_{i}"]["kernel"])
            put_bn(b, p_node[f"{bn}_{i}"], s_node[f"{bn}_{i}"])

    if cfg.trunk == "pointnetvlad":
        if cfg.use_input_transform:
            st = f"{tp}stn"
            put_mlp(
                p["trunk"]["stn"]["PointMLP_0"],
                s["trunk"]["stn"]["PointMLP_0"],
                [f"{st}.conv{i}" for i in (1, 2, 3)],
                [f"{st}.bn{i}" for i in (1, 2, 3)],
            )
            put_mlp(
                p["trunk"]["stn"], s["trunk"]["stn"],
                [f"{st}.fc1", f"{st}.fc2"], [f"{st}.bn4", f"{st}.bn5"],
                dense="fc", bn="fc_bn", to_conv=_kernel_to_linear,
            )
            out[f"{st}.fc3.weight"] = _kernel_to_linear(
                p["trunk"]["stn"]["fc_out"]["kernel"]
            )
            # Our STN bakes the identity into the bias; upstream adds it in
            # forward — subtract it back out (inverse of the import fold).
            out[f"{st}.fc3.bias"] = (
                np.asarray(p["trunk"]["stn"]["fc_out"]["bias"], np.float32)
                - np.eye(3, dtype=np.float32).reshape(-1)
            )
        put_mlp(
            p["trunk"]["mlp1"], s["trunk"]["mlp1"],
            [f"{tp}conv{i}" for i in (1, 2)],
            [f"{tp}bn{i}" for i in (1, 2)],
        )
        put_mlp(
            p["trunk"]["mlp2"], s["trunk"]["mlp2"],
            [f"{tp}conv{i}" for i in (3, 4, 5)],
            [f"{tp}bn{i}" for i in (3, 4, 5)],
        )
    elif cfg.trunk == "lpdnet":
        put_mlp(
            p["trunk"]["pre"], s["trunk"]["pre"],
            [f"{tp}pre.conv{i}" for i in (1, 2)],
            [f"{tp}pre.bn{i}" for i in (1, 2)],
        )
        for name in ("edge_spatial", "edge_feature"):
            out[f"{tp}{name}.conv.weight"] = _kernel_to_conv(
                p["trunk"][name]["kernel"]
            )
            put_bn(
                f"{tp}{name}.bn",
                p["trunk"][name]["bn"], s["trunk"][name]["bn"],
            )
        n_post = len(
            [k for k in p["trunk"]["post"] if k.startswith("dense_")]
        )
        put_mlp(
            p["trunk"]["post"], s["trunk"]["post"],
            [f"{tp}post.conv{i + 1}" for i in range(n_post)],
            [f"{tp}post.bn{i + 1}" for i in range(n_post)],
        )
    else:
        raise ValueError(f"unknown trunk: {cfg.trunk!r}")

    nv = p["netvlad"]
    out[f"{hp}cluster_weights"] = np.asarray(
        nv["cluster_weights"]["kernel"], np.float32
    )
    if cfg.add_batch_norm:
        put_bn(f"{hp}bn1", nv["cluster_bn"], s["netvlad"]["cluster_bn"])
    else:
        out[f"{hp}cluster_biases"] = np.asarray(
            nv["cluster_weights"]["bias"], np.float32
        )
    out[f"{hp}cluster_weights2"] = np.ascontiguousarray(
        np.asarray(nv["cluster_centers"], np.float32).T
    )[None]
    d, k = cfg.feature_dim, cfg.num_clusters
    h1 = np.asarray(nv["hidden1_weights"]["kernel"], np.float32)
    out[f"{hp}hidden1_weights"] = np.ascontiguousarray(
        h1.reshape(k, d, cfg.output_dim).transpose(1, 0, 2).reshape(
            d * k, cfg.output_dim
        )
    )
    if cfg.post_projection_bn:
        put_bn(f"{hp}bn2", nv["hidden1_bn"], s["netvlad"]["hidden1_bn"])
    if cfg.gating:
        g = f"{hp}context_gating"
        cg = nv["context_gating"]
        out[f"{g}.gating_weights"] = np.asarray(
            cg["gating_weights"]["kernel"], np.float32
        )
        if cfg.add_batch_norm:
            put_bn(
                f"{g}.bn1", cg["gating_bn"],
                s["netvlad"]["context_gating"]["gating_bn"],
            )
        else:
            out[f"{g}.gating_biases"] = np.asarray(
                cg["gating_weights"]["bias"], np.float32
            )
    return out


# ---------------------------------------------------------------------------
# Shape-driven fallback: rename arbitrary upstream-lineage module names onto
# the canonical table by (module kind, tensor shapes, topological position).
# ---------------------------------------------------------------------------


def _group_modules(sd: Dict[str, np.ndarray]):
    """Group a state_dict into (prefix, {suffix: array}) modules in
    insertion (= module definition = topological) order. Bare-parameter
    keys (upstream NetVLAD ``cluster_weights`` etc.) are their own modules
    with suffix ''."""
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    known = {
        "weight", "bias", "running_mean", "running_var",
        "num_batches_tracked",
    }
    for key, val in sd.items():
        prefix, _, suffix = key.rpartition(".")
        if suffix not in known:
            prefix, suffix = key, ""
        mods.setdefault(prefix, {})[suffix] = np.asarray(val)
    return list(mods.items())


def _module_signature(parts: Dict[str, np.ndarray]) -> Tuple:
    """(kind, shape facts) — invariant under renaming AND under the
    cosmetic conv layout differences the importer already normalizes
    (Conv1d (out,in,1) / Conv2d (out,in,1,1) / (out,1,1,in) all flatten to
    (out, in))."""
    if "running_mean" in parts:
        return ("bn", parts["running_mean"].shape)
    if "" in parts:
        return ("param", parts[""].squeeze().shape)
    w = parts["weight"]
    if w.ndim >= 2:
        return ("convlike", (w.shape[0], int(np.prod(w.shape[1:]))))
    return ("vector", w.shape)


def remap_state_dict_by_shape(
    sd: Dict[str, np.ndarray],
    cfg: ModelConfig,
    trunk_prefix: str = "point_net.",
    head_prefix: str = "net_vlad.",
) -> Dict[str, np.ndarray]:
    """Rename a differently-named upstream-lineage state_dict onto the
    canonical name table (VERDICT round-2 item 5).

    The canonical slot list comes from :func:`export_state_dict` on a
    freshly-initialized model (names + shapes in topological order); each
    canonical module greedily claims the first unclaimed source module with
    the same signature. Raises with a diagnostic when a slot has no match
    — shape mismatches mean a genuinely different architecture, which no
    renaming fixes.
    """
    import jax

    from lpdnet_tpu.models.model import init_model

    _, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    canonical = export_state_dict(
        variables, cfg, trunk_prefix=trunk_prefix, head_prefix=head_prefix
    )
    want = _group_modules(canonical)
    have = _group_modules(sd)
    claimed = [False] * len(have)
    out: Dict[str, np.ndarray] = {}
    for want_prefix, want_parts in want:
        sig = _module_signature(want_parts)
        for i, (have_prefix, have_parts) in enumerate(have):
            if claimed[i] or _module_signature(have_parts) != sig:
                continue
            claimed[i] = True
            for suffix, val in have_parts.items():
                key = (
                    f"{want_prefix}.{suffix}" if suffix else want_prefix
                )
                out[key] = val
            break
        else:
            raise ValueError(
                f"shape-fallback: no source module matches {want_prefix} "
                f"(signature {sig}); unclaimed sources: "
                f"{[hp for j, (hp, _) in enumerate(have) if not claimed[j]][:6]}"
            )
    # Unclaimed leftovers survive under their original names so the strict
    # check still reports them.
    for i, (have_prefix, have_parts) in enumerate(have):
        if not claimed[i]:
            for suffix, val in have_parts.items():
                key = (
                    f"{have_prefix}.{suffix}" if suffix else have_prefix
                )
                out[key] = val
    return out


def load_torch_checkpoint(
    path: str, cfg: ModelConfig, **kwargs
) -> Dict[str, Any]:
    """Load a reference ``torch.save`` checkpoint file. Accepts both a bare
    state_dict and the reference's ``{'epoch', 'state_dict', 'optimizer'}``
    wrapper (SURVEY C17); strips a ``module.`` DataParallel prefix."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {
        (key[len("module."):] if key.startswith("module.") else key): val
        for key, val in sd.items()
    }
    return import_state_dict(sd, cfg, **kwargs)
