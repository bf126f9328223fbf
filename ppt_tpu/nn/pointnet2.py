"""PointNet++ SSG / MSG backbones in flax, channels-last.

Reference: ``models/pointnet2/pointnet2.py:6-73`` with set-abstraction
layers from ``models/pointnet2/pointnet2_utils.py:160-266``. The torch
[B, C, N] permute dance disappears: everything stays ``[B, N, C]`` and the
shared MLPs (1x1 Conv2d + BN + ReLU in torch) become Dense + BatchNorm
over the last axis — the same math, shaped for the MXU.

Both trunks end in the 2-layer FC head producing a 256-d feature (the
classifier is ULIP's text-embedding dot product, not an FC layer).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


class SetAbstraction(nn.Module):
    """Single-scale grouping SA layer
    (``PointNetSetAbstraction``, pointnet2_utils.py:161-206)."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        if self.group_all:
            new_xyz, new_points = ops.sample_and_group_all(xyz, points)
        else:
            new_xyz, new_points = ops.sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points
            )
        x = new_points.astype(self.dtype)  # [B, S, K, C]
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        return new_xyz, jnp.max(x, axis=2)  # [B, S, C_out]


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA layer
    (``PointNetSetAbstractionMsg``, pointnet2_utils.py:209-266)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        points: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        fps_idx = ops.farthest_point_sample(xyz, self.npoint)
        new_xyz = ops.index_points(xyz, fps_idx)
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        outs = []
        for i, (radius, nsample) in enumerate(
            zip(self.radius_list, self.nsample_list)
        ):
            if on_tpu and self.npoint % 8 == 0:
                from ppt_tpu.kernels.group import ball_query_gather

                idx, grouped_xyz = ball_query_gather(
                    float(radius), nsample, xyz, new_xyz, relative=True
                )
                grouped_xyz = grouped_xyz.astype(xyz.dtype)
            else:
                idx = ops.query_ball_point(radius, nsample, xyz, new_xyz)
                grouped_xyz = ops.index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [ops.index_points(points, idx), grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            x = grouped.astype(self.dtype)
            for j, ch in enumerate(self.mlp_list[i]):
                x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}_{j}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    dtype=jnp.float32,
                    name=f"bn{i}_{j}",
                )(x)
                x = nn.relu(x)
            outs.append(jnp.max(x, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class _FcHead(nn.Module):
    """Shared 1024 -> 512 -> 256 head (pointnet2.py:14-20,49-55)."""

    drop1: float = 0.4
    drop2: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop1)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn2"
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop2)(x, deterministic=not train)
        return x


class PointNet2Ssg(nn.Module):
    """Single-scale-grouping trunk -> 256-d feature
    (``Pointnet2_Ssg``, pointnet2.py:6-38)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        l1_xyz, l1 = SetAbstraction(
            512, 0.2, 32, (64, 64, 128), dtype=self.dtype, name="sa1"
        )(xyz, None, train)
        l2_xyz, l2 = SetAbstraction(
            128, 0.4, 64, (128, 128, 256), dtype=self.dtype, name="sa2"
        )(l1_xyz, l1, train)
        _, l3 = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True,
            dtype=self.dtype, name="sa3",
        )(l2_xyz, l2, train)
        return _FcHead(0.4, 0.4, dtype=self.dtype, name="head")(l3[:, 0], train)


class PointNet2Msg(nn.Module):
    """Multi-scale-grouping trunk -> 256-d feature
    (``Pointnet2_Msg``, pointnet2.py:40-73)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        l1_xyz, l1 = SetAbstractionMsg(
            512,
            (0.1, 0.2, 0.4),
            (16, 32, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            dtype=self.dtype,
            name="sa1",
        )(xyz, None, train)
        l2_xyz, l2 = SetAbstractionMsg(
            128,
            (0.2, 0.4, 0.8),
            (32, 64, 128),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            dtype=self.dtype,
            name="sa2",
        )(l1_xyz, l1, train)
        _, l3 = SetAbstraction(
            None, None, None, (256, 512, 1024), group_all=True,
            dtype=self.dtype, name="sa3",
        )(l2_xyz, l2, train)
        return _FcHead(0.4, 0.5, dtype=self.dtype, name="head")(l3[:, 0], train)
