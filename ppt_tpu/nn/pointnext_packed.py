"""PointNeXt over packed (offset/ragged) clouds — the working equivalent
of the reference's PyG variant.

Reference: ``openpoints/models/backbone/pointnextPyG.py:1-555`` — a
torch_geometric re-implementation of PointNeXt for variable-size inputs
whose own header reads "This file is still under development. DO NOT
USE", and whose dependencies (torch_geometric, torch_scatter) do not
exist in this environment. This port delivers the capability the file
was FOR — PointNeXt on packed clouds with per-cloud offsets — on the
framework's ragged ops instead of PyG graphs.

Every module and parameter name mirrors ``ppt_tpu.nn.pointnext`` so a
trained batched-PointNeXt variables tree drives this model unchanged;
the self-consistency test (``tests/test_pointnext_packed.py``) exploits
exactly that: on equal-size clouds both implementations must produce
identical features with the same weights.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu.nn.pointnext import PointNextConfig, _ConvBnAct
from ppt_tpu.ops.ragged import (
    ball_query_packed,
    farthest_point_sample_packed,
    segment_ids_from_offsets,
)


class SetAbstractionPacked(nn.Module):
    """Strided SA over packed clouds (mirror of ``SetAbstractionNext``)."""

    out_channels: int
    stride: int
    radius: float
    nsample: int
    npoint: int  # static per-cloud sample count (equal-size clouds)
    sa_layers: int = 2
    use_res: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,  # [n, 3]
        feats: jax.Array,  # [n, C]
        offsets: jax.Array,  # [B]
        train: bool = False,
    ):
        B = offsets.shape[0]
        fps_idx = farthest_point_sample_packed(xyz, offsets, self.npoint)
        flat_idx = fps_idx.reshape(-1)
        new_xyz = xyz[flat_idx]
        new_off = (jnp.arange(1, B + 1) * self.npoint).astype(offsets.dtype)

        idx = ball_query_packed(
            self.radius, self.nsample, xyz, offsets, new_xyz, new_off
        )
        dp = (xyz[idx] - new_xyz[:, None, :]) / self.radius  # normalize_dp
        fj = feats[idx]
        x = jnp.concatenate([dp.astype(self.dtype), fj], axis=-1)

        mid = self.out_channels // 2 if self.stride > 1 else self.out_channels
        widths = [mid] * (self.sa_layers - 1) + [self.out_channels]
        for i, w in enumerate(widths):
            last = i == len(widths) - 1
            x = _ConvBnAct(
                w, use_act=not (last and self.use_res),
                dtype=self.dtype, name=f"conv{i}",
            )(x, train)
        pooled = jnp.max(x, axis=1)  # [m, out]

        if self.use_res:
            fi = feats[flat_idx]
            if fi.shape[-1] != self.out_channels:
                identity = nn.Dense(
                    self.out_channels, dtype=self.dtype, name="skipconv"
                )(fi)
            else:
                identity = fi
            pooled = nn.relu(pooled + identity)
        return new_xyz, pooled, new_off


class GlobalAggregationPacked(nn.Module):
    """Group-all tail SA: per-cloud max via segment reduction
    (mirror of ``GlobalAggregation``)."""

    out_channels: int
    sa_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, offsets, train: bool = False):
        n = feats.shape[0]
        B = offsets.shape[0]
        x = jnp.concatenate([xyz.astype(self.dtype), feats], axis=-1)
        for i in range(self.sa_layers):
            x = _ConvBnAct(self.out_channels, dtype=self.dtype,
                           name=f"conv{i}")(x, train)
        seg = segment_ids_from_offsets(offsets, n)
        return jax.ops.segment_max(x, seg, num_segments=B)  # [B, out]


class PointNextPacked(nn.Module):
    """PointNeXt-S trunk over ``(pts [total, C], offsets [B])`` packed
    clouds -> per-cloud 256-d features [B, 256]. Equal-size clouds make
    every per-stage sample count static (``count // stride``)."""

    config: PointNextConfig = PointNextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pts: jax.Array, offsets: jax.Array, train: bool = False
    ) -> jax.Array:
        cfg = self.config
        B = offsets.shape[0]
        count = pts.shape[0] // B
        xyz = pts[:, :3].astype(jnp.float32)
        feats = pts.astype(self.dtype)

        channels = cfg.stage_channels()
        radii = cfg.stage_radii()
        for i, (ch, stride, nblocks) in enumerate(
            zip(channels, cfg.strides, cfg.blocks)
        ):
            if i == 0 and stride == 1:
                feats = nn.Dense(ch, dtype=self.dtype, name="stem")(feats)
            elif stride == 1:
                feats = GlobalAggregationPacked(
                    ch, cfg.sa_layers, dtype=self.dtype,
                    name=f"stage{i}_global",
                )(xyz, feats, offsets, train)
                xyz = None
            else:
                count = count // stride
                xyz, feats, offsets = SetAbstractionPacked(
                    ch, stride, radii[i], cfg.nsample, npoint=count,
                    sa_layers=cfg.sa_layers, use_res=cfg.sa_use_res,
                    dtype=self.dtype, name=f"stage{i}_sa",
                )(xyz, feats, offsets, train)
                if nblocks > 1:
                    raise NotImplementedError(
                        "packed InvResMLP depth blocks not implemented; "
                        "PointNeXt-S (blocks=[1]*6) is the supported plan"
                    )

        x = feats
        for i, w in enumerate(cfg.head_mlps):
            x = nn.Dense(w, use_bias=False, dtype=self.dtype,
                         name=f"head_fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=jnp.float32, name=f"head_bn{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(cfg.head_dropout)(x, deterministic=not train)
        return x
