"""PCT: Point Cloud Transformer backbone, channels-last flax.

Reference: ``openpoints/models/backbone/pct.py`` (Guo et al. 2021 via the
PCT_Pytorch implementation): per-point embedding MLP, two FPS+kNN
neighbor-embedding stages (Local_op: shared MLP + max over neighbors),
four offset-style self-attention layers whose outputs are concatenated,
a 1280->1024 fusion, global max pool, and an FC trunk ending at 256-d to
match the ULIP backbone convention.

The PCT attention normalizes attention weights column-wise then
re-normalizes rows (the "offset attention" trick); sequence length is the
256 sampled groups — one dense [B, 256, 256] attention map per layer,
MXU-friendly at these sizes.

Note on parity testing: the vendored reference PCT cannot be executed as
an oracle — its ``Pct.forward`` unpacks two values from
``SubsampleGroup`` (``backbone/pct.py:67``) while ``SubsampleGroup``
returns a four-tuple when features are passed
(``layers/group_embed.py:52``), and its ``Local_op`` applies ``Conv2d``
to channels-last input without the original implementation's permute.
This module therefore follows the paper / the original PCT_Pytorch
semantics (tied q/k weights, offset attention with column softmax and
L1 row re-normalization, FPS+kNN neighbor embedding) and is covered by
shape/behavior tests rather than a torch forward-parity oracle.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


class LocalOp(nn.Module):
    """Neighbor-embedding stage (``Local_op``): shared MLP over
    [B, G, K, C] then max over neighbors."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, grouped: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype, name="conv1")(grouped)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(x)
        x = nn.relu(x)
        return jnp.max(x, axis=2)  # [B, G, C]


class OffsetAttention(nn.Module):
    """PCT SA_Layer: shared q/k projection (tied weights), column-softmax
    + row re-normalization, residual through a transform conv."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, N, C]
        qk = nn.Dense(self.channels // 4, use_bias=False, dtype=self.dtype, name="qk_conv")
        x_q = qk(x)  # tied q/k weights (reference shares the parameter)
        x_k = qk(x)
        x_v = nn.Dense(self.channels, dtype=self.dtype, name="v_conv")(x)
        energy = jnp.einsum("bnc,bmc->bnm", x_q, x_k)
        attention = jax.nn.softmax(energy.astype(jnp.float32), axis=-1)
        attention = attention / (1e-9 + jnp.sum(attention, axis=1, keepdims=True))
        x_r = jnp.einsum("bnm,bmc->bnc", attention.astype(self.dtype), x_v)
        x_r = nn.Dense(self.channels, dtype=self.dtype, name="trans_conv")(x_r)
        x_r = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="after_norm")(x_r)
        x_r = nn.relu(x_r)
        return x + x_r


def _subsample_group(
    xyz: jax.Array, feats: jax.Array, npoint: int, nsample: int
) -> Tuple[jax.Array, jax.Array]:
    """FPS + kNN grouping with concat[center_feat, neighbor_feats]
    (SubsampleGroup 'knn' semantics): output [B, G, K, 2C]."""
    idx = ops.farthest_point_sample(xyz, npoint)
    new_xyz = ops.index_points(xyz, idx)
    center_f = ops.index_points(feats, idx)  # [B, G, C]
    nbr = ops.knn_point(nsample, xyz, new_xyz)
    grouped = ops.index_points(feats, nbr)  # [B, G, K, C]
    center_tiled = jnp.broadcast_to(
        center_f[:, :, None, :], grouped.shape
    )
    return new_xyz, jnp.concatenate([grouped - center_tiled, center_tiled], axis=-1)


class Pct(nn.Module):
    """PCT trunk -> 256-d feature."""

    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(64, use_bias=False, dtype=self.dtype, name="conv1")(xyz.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(64, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(x)
        x = nn.relu(x)

        new_xyz, grouped = _subsample_group(xyz, x, 512, 32)  # [B,512,32,128]
        f0 = LocalOp(128, dtype=self.dtype, name="gather_local_0")(grouped, train)
        new_xyz, grouped = _subsample_group(new_xyz, f0, 256, 32)  # [B,256,32,256]
        f1 = LocalOp(256, dtype=self.dtype, name="gather_local_1")(grouped, train)

        # Point_Transformer_Last: 2 conv-bn-relu + 4 offset-attention
        h = nn.Dense(256, use_bias=False, dtype=self.dtype, name="pt_conv1")(f1)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="pt_bn1")(h)
        h = nn.relu(h)
        h = nn.Dense(256, use_bias=False, dtype=self.dtype, name="pt_conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="pt_bn2")(h)
        h = nn.relu(h)
        sas = []
        for i in range(4):
            h = OffsetAttention(256, dtype=self.dtype, name=f"sa{i+1}")(h, train)
            sas.append(h)
        x = jnp.concatenate(sas + [f1], axis=-1)  # [B, 256, 1280]

        x = nn.Dense(1024, use_bias=False, dtype=self.dtype, name="conv_fuse")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn_fuse")(x)
        x = nn.leaky_relu(x, 0.2)
        x = jnp.max(x, axis=1)  # [B, 1024]

        x = nn.Dense(512, use_bias=False, dtype=self.dtype, name="linear1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn6")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="linear2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn7")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x
