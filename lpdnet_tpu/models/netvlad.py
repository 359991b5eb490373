"""NetVLAD ("Loupe") head + context gating as Flax modules.

Reference: ``NetVLADLoupe`` / ``GatingContext`` / ``Flatten`` in
``models/PointNetVlad.py`` (SURVEY C12): soft-assignment of N per-point
features to K clusters (linear -> BN or bias -> softmax), residual
aggregation against learned centers (``cluster_weights2``), intra- and
global L2 normalization, projection to ``output_dim``, then a sigmoid
context gate.

The aggregation math lives in ``lpdnet_tpu.ops.netvlad.netvlad_aggregate``
(einsum chain on the MXU); this module owns the parameters.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lpdnet_tpu.ops.netvlad import netvlad_aggregate


class GatingContext(nn.Module):
    """Sigmoid context gating: out = x * sigmoid(BN(x @ W)) (SURVEY C12)."""

    dim: int
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        gates = nn.Dense(
            self.dim,
            use_bias=not self.add_batch_norm,
            kernel_init=nn.initializers.normal(1.0 / jnp.sqrt(self.dim)),
            name="gating_weights",
        )(x)
        if self.add_batch_norm:
            gates = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="gating_bn"
            )(gates)
        return x * nn.sigmoid(gates)


class NetVLADLoupe(nn.Module):
    """(B, N, D) per-point features -> (B, output_dim) global descriptor."""

    feature_size: int = 1024
    cluster_size: int = 64
    output_dim: int = 256
    add_batch_norm: bool = True
    gating: bool = True
    # The reference NetVLADLoupe applies a BatchNorm1d ("bn2") to the output
    # projection unconditionally (even with add_batch_norm=False), before
    # context gating; the projection itself is a bare matmul (no bias).
    post_projection_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.feature_size
        k = self.cluster_size
        scale = 1.0 / jnp.sqrt(d)

        # Assignment logits on the compute dtype (a (B*N, D) @ (D, K)
        # matmul); softmax/aggregation/normalization stay float32.
        logits = nn.Dense(
            k,
            use_bias=not self.add_batch_norm,
            kernel_init=nn.initializers.normal(scale),
            dtype=self.dtype,
            name="cluster_weights",
        )(x.astype(self.dtype)).astype(jnp.float32)
        if self.add_batch_norm:
            logits = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="cluster_bn"
            )(logits)

        centers = self.param(
            "cluster_centers", nn.initializers.normal(scale), (k, d)
        )
        vlad = netvlad_aggregate(x.astype(jnp.float32), logits, centers)

        out = nn.Dense(
            self.output_dim,
            use_bias=not self.post_projection_bn,
            kernel_init=nn.initializers.normal(1.0 / jnp.sqrt(k)),
            name="hidden1_weights",
        )(vlad)
        if self.post_projection_bn:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="hidden1_bn"
            )(out)
        if self.gating:
            out = GatingContext(
                self.output_dim,
                add_batch_norm=self.add_batch_norm,
                name="context_gating",
            )(out, train=train)
        return out
