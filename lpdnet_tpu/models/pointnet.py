"""PointNet trunk: input-transform net + shared per-point MLP.

Reference: ``STN3d`` / ``PointNetfeat`` in ``models/PointNetVlad.py``
(SURVEY C10): shared 1-D convs 3->64->128->1024 with BN/ReLU in the
transform net (FCs 512->256->9, identity-initialized), and a shared
per-point MLP 3->64->64->64->128->1024 with BN/ReLU feeding NetVLAD.

TPU-native notes: the reference's ``Conv2d(1, 64, kernel=(1, 3))`` over a
``(B, 1, N, 3)`` tensor is just a per-point Dense on xyz; all shared "convs"
here are ``nn.Dense`` on the channel axis of ``(B, N, C)``, which XLA maps
straight onto the MXU as a single (B*N, Cin) @ (Cin, Cout) matmul.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PointMLP(nn.Module):
    """Shared per-point MLP: Dense + BatchNorm + ReLU stack.

    ``relu_last=False`` leaves the final layer linear-after-BN (the trunk's
    1024-D output feeds NetVLAD's soft-assignment without a nonlinearity,
    mirroring the reference's final conv+BN).

    ``dtype``: activation/matmul dtype (bfloat16 on the TPU fast path);
    params stay float32. BatchNorm statistics are computed in float32 in
    training mode (bf16 accumulation over B*N samples loses ~2 digits);
    in inference mode BN is a pure scale/shift and runs in ``dtype``.
    """

    widths: Sequence[int]
    relu_last: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn_dtype = jnp.float32 if train else self.dtype
        for i, w in enumerate(self.widths):
            # No bias: the following BatchNorm's mean subtraction cancels it
            # (a bias here would be a dead parameter with pure-noise grads).
            x = nn.Dense(
                w, use_bias=False, dtype=self.dtype, name=f"dense_{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=bn_dtype, name=f"bn_{i}",
            )(x)
            if i + 1 < len(self.widths) or self.relu_last:
                x = nn.relu(x)
        return x


class STN3d(nn.Module):
    """Spatial transformer predicting a per-cloud KxK alignment matrix.

    Reference ``STN3d`` (SURVEY C10): shared convs 3->64->128->1024, global
    max-pool, FCs 1024->512->256->K^2 with the output layer initialized to
    zero + identity bias so training starts from the identity transform.
    """

    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, N, k) -> (B, k, k)
        h = PointMLP([64, 128, 1024], relu_last=True, dtype=self.dtype)(
            x, train=train
        )
        h = jnp.max(h, axis=1)  # global max-pool over points
        h = h.astype(jnp.float32)
        for i, w in enumerate([512, 256]):
            h = nn.Dense(w, use_bias=False, name=f"fc_{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"fc_bn_{i}"
            )(h)
            h = nn.relu(h)
        ident = jnp.eye(self.k, dtype=h.dtype).reshape(-1)
        h = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.broadcast_to(
                ident, shape
            ).astype(dtype),
            name="fc_out",
        )(h)
        return h.reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Per-point 1024-D features for the PointNetVLAD baseline trunk.

    Input (B, N, 3) -> (B, N, feature_dim). ``max_pool=False`` in the
    reference (NetVLAD consumes per-point features, not a pooled vector).
    """

    feature_dim: int = 1024
    use_input_transform: bool = True
    use_feature_transform: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.use_input_transform:
            trans = STN3d(k=3, dtype=self.dtype, name="stn")(x, train=train)
            x = jnp.einsum(
                "bnc,bcd->bnd", x, trans, preferred_element_type=jnp.float32
            )
        x = PointMLP([64, 64], relu_last=True, dtype=self.dtype, name="mlp1")(
            x, train=train
        )
        if self.use_feature_transform:
            ftrans = STN3d(k=64, dtype=self.dtype, name="fstn")(x, train=train)
            x = jnp.einsum(
                "bnc,bcd->bnd", x, ftrans, preferred_element_type=jnp.float32
            )
        x = PointMLP(
            [64, 128, self.feature_dim], relu_last=False, dtype=self.dtype,
            name="mlp2",
        )(x, train=train)
        return x
