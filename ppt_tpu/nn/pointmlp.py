"""PointMLP backbone in flax, channels-last.

Reference: ``models/pointmlp/pointMLP.py:124-356`` — a 4-stage residual
MLP point network. PPT uses the ``pointMLP()`` configuration
(``:352-356``): embed_dim 64, no biases, ``use_xyz=False``,
``normalize='anchor'`` geometric affine, k=24 neighbors, channel doubling
and 2x point reduction per stage, 2 pre + 2 pos residual blocks each, and
a 1024 -> 512 -> 256 classifier trunk.

The torch version round-trips through ``[B*G, D, K]`` Conv1d stacks; here
the same shared MLPs run directly on ``[B, G, K, D]`` channels-last
tensors as Dense layers.

Parity notes:
  - the geometric affine normalizes by a *per-cloud scalar* std with
    Bessel's correction (``torch.std`` over the flattened cloud,
    ``pointMLP.py:168``) — reproduced with ``ddof=1``;
  - residual blocks are ``act(net2(net1(x)) + x)`` (``:216``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


@dataclasses.dataclass(frozen=True)
class PointMLPConfig:
    points: int = 1024  # anchors derive from this STATIC count (the
    # reference divides config `points`, not the runtime cloud size)
    embed_dim: int = 64
    res_expansion: float = 1.0
    use_xyz: bool = False
    bias: bool = False
    normalize: str = "anchor"  # 'center' | 'anchor' | None
    dim_expansion: Tuple[int, ...] = (2, 2, 2, 2)
    pre_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    pos_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    k_neighbors: Tuple[int, ...] = (24, 24, 24, 24)
    reducers: Tuple[int, ...] = (2, 2, 2, 2)


class ConvBnRelu(nn.Module):
    out: int
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.out, use_bias=self.bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn"
        )(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """``ConvBNReLURes1D`` (pointMLP.py:190-222), groups=1 path."""

    channel: int
    res_expansion: float = 1.0
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.channel * self.res_expansion)
        h = nn.Dense(hidden, use_bias=self.bias, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn1"
        )(h)
        h = nn.relu(h)
        h = nn.Dense(self.channel, use_bias=self.bias, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn2"
        )(h)
        return nn.relu(h + x)


class LocalGrouper(nn.Module):
    """FPS + kNN + geometric-affine normalization
    (``LocalGrouper``, pointMLP.py:124-173)."""

    channel: int
    groups: int
    kneighbors: int
    use_xyz: bool = False
    normalize: str = "anchor"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jax.Array, points: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        B = xyz.shape[0]
        fps_idx = ops.farthest_point_sample(xyz, self.groups)
        new_xyz = ops.index_points(xyz, fps_idx)  # [B, G, 3]
        new_points = ops.index_points(points, fps_idx)  # [B, G, D]

        idx = ops.knn_point(self.kneighbors, xyz, new_xyz)
        grouped_xyz = ops.index_points(xyz, idx)  # [B, G, K, 3]
        grouped = ops.index_points(points, idx)  # [B, G, K, D]
        if self.use_xyz:
            grouped = jnp.concatenate([grouped, grouped_xyz.astype(grouped.dtype)], axis=-1)

        if self.normalize in ("center", "anchor"):
            dim = self.channel + (3 if self.use_xyz else 0)
            alpha = self.param(
                "affine_alpha", nn.initializers.ones, (1, 1, 1, dim)
            )
            beta = self.param(
                "affine_beta", nn.initializers.zeros, (1, 1, 1, dim)
            )
            if self.normalize == "center":
                mean = jnp.mean(grouped, axis=2, keepdims=True)
            else:  # anchor
                anchor = (
                    jnp.concatenate([new_points, new_xyz.astype(new_points.dtype)], axis=-1)
                    if self.use_xyz
                    else new_points
                )
                mean = anchor[:, :, None, :]
            centered = grouped - mean
            # per-cloud scalar std, Bessel-corrected (pointMLP.py:168)
            flat = centered.reshape(B, -1).astype(jnp.float32)
            std = jnp.std(flat, axis=-1, ddof=1)[:, None, None, None]
            grouped = centered / (std + 1e-5).astype(centered.dtype)
            grouped = alpha.astype(grouped.dtype) * grouped + beta.astype(grouped.dtype)

        tiled = jnp.broadcast_to(
            new_points[:, :, None, :],
            (*grouped.shape[:3], new_points.shape[-1]),
        )
        return new_xyz, jnp.concatenate([grouped, tiled], axis=-1)


class PreExtraction(nn.Module):
    """Per-group residual MLP + max-pool over neighbors
    (``PreExtraction``, pointMLP.py:225-252)."""

    out_channels: int
    blocks: int = 2
    res_expansion: float = 1.0
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, G, K, D] -> [B, G, out]
        x = ConvBnRelu(self.out_channels, self.bias, dtype=self.dtype, name="transfer")(x, train)
        for i in range(self.blocks):
            x = ResBlock(
                self.out_channels, self.res_expansion, self.bias,
                dtype=self.dtype, name=f"res{i}",
            )(x, train)
        return jnp.max(x, axis=2)


class PosExtraction(nn.Module):
    """Per-anchor residual MLP (``PosExtraction``, pointMLP.py:255-270)."""

    channels: int
    blocks: int = 2
    res_expansion: float = 1.0
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.blocks):
            x = ResBlock(
                self.channels, self.res_expansion, self.bias,
                dtype=self.dtype, name=f"res{i}",
            )(x, train)
        return x


class PointMLP(nn.Module):
    """4-stage residual-MLP trunk -> 256-d feature
    (``Model`` + ``pointMLP()``, pointMLP.py:273-356)."""

    config: PointMLPConfig = PointMLPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        B, N, _ = xyz.shape
        x = ConvBnRelu(cfg.embed_dim, cfg.bias, dtype=self.dtype, name="embedding")(
            xyz.astype(self.dtype), train
        )

        channel = cfg.embed_dim
        anchors = cfg.points
        coords = xyz
        for i in range(len(cfg.pre_blocks)):
            out_channel = channel * cfg.dim_expansion[i]
            anchors = anchors // cfg.reducers[i]
            coords, grouped = LocalGrouper(
                channel, anchors, cfg.k_neighbors[i],
                use_xyz=cfg.use_xyz, normalize=cfg.normalize,
                dtype=self.dtype, name=f"grouper{i}",
            )(coords, x)
            x = PreExtraction(
                out_channel, cfg.pre_blocks[i], cfg.res_expansion, cfg.bias,
                dtype=self.dtype, name=f"pre{i}",
            )(grouped, train)
            x = PosExtraction(
                out_channel, cfg.pos_blocks[i], cfg.res_expansion, cfg.bias,
                dtype=self.dtype, name=f"pos{i}",
            )(x, train)
            channel = out_channel

        x = jnp.max(x, axis=1)  # [B, 1024]
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        return x
