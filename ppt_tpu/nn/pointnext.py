"""PointNeXt-S encoder + classification head in flax, channels-last.

Reference: ``openpoints/models/backbone/pointnext.py:81-470`` configured by
``models/pointnext/pointnext-s.yaml`` (the exact network PPT's
``ULIP_PN_NEXT`` builds): width 32, blocks [1]*6, strides [1,2,2,2,2,1],
in_channels 4 (xyz + height), 2-layer SA convs with residual
(``sa_use_res``), ball-query radius 0.15 scaled 1.5x per downsampling,
nsample 32, ``dp_fj`` aggregation with relative xyz normalized by the
radius (``normalize_dp``), and a BaseCls/ClsHead 512->512->256 MLP head
(``cls_base.py:78-140`` with ``num_classes=-1`` — no logits layer; ULIP
classifies against text embeddings).

With blocks=[1]*6 the InvResMLP depth blocks are absent (each stage is a
single SA); the InvResMLP block is still provided for the scaled variants
(PointNeXt-B/L/XL).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


@dataclasses.dataclass(frozen=True)
class PointNextConfig:
    in_channels: int = 4
    width: int = 32
    blocks: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 2, 1)
    radius: float = 0.15
    radius_scaling: float = 1.5
    nsample: int = 32
    expansion: int = 4
    sa_layers: int = 2
    sa_use_res: bool = True
    head_mlps: Tuple[int, ...] = (512, 256)
    head_dropout: float = 0.5

    def stage_channels(self) -> Tuple[int, ...]:
        w = self.width
        out = []
        for s in self.strides:
            if s != 1:
                w *= 2
            out.append(w)
        return tuple(out)

    @classmethod
    def b(cls) -> "PointNextConfig":
        """PointNeXt-B (``cfgs/s3dis/pointnext-b.yaml``: blocks
        [1,2,3,2,2], strides [1,4,4,4,4], 1-layer SA, no SA residual,
        radius 0.1)."""
        return cls(blocks=(1, 2, 3, 2, 2), strides=(1, 4, 4, 4, 4),
                   sa_layers=1, sa_use_res=False, radius=0.1)

    @classmethod
    def l(cls) -> "PointNextConfig":
        """PointNeXt-L (``cfgs/s3dis/pointnext-l.yaml``)."""
        return cls(blocks=(1, 3, 5, 3, 3), strides=(1, 4, 4, 4, 4),
                   sa_layers=1, sa_use_res=False, radius=0.1)

    @classmethod
    def xl(cls) -> "PointNextConfig":
        """PointNeXt-XL (``cfgs/s3dis/pointnext-xl.yaml``: width 64)."""
        return cls(blocks=(1, 4, 7, 4, 4), strides=(1, 4, 4, 4, 4),
                   sa_layers=1, sa_use_res=False, width=64, radius=0.1)

    def stage_radii(self) -> Tuple[float, ...]:
        """First-block radius per stage (``_to_full_list``,
        pointnext.py:400-408); with blocks=[1]* only the first matters."""
        r = self.radius
        out = []
        for s in self.strides:
            out.append(r)
            if s != 1:
                r *= self.radius_scaling
        return tuple(out)


class _ConvBnAct(nn.Module):
    out: int
    use_norm: bool = True
    use_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # conv bias is omitted when BN follows (reference create_convblock
        # behavior — torch convs with norm have bias=False)
        x = nn.Dense(
            self.out, use_bias=not self.use_norm, dtype=self.dtype, name="conv"
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="bn"
            )(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class SetAbstractionNext(nn.Module):
    """Strided SA with residual (``SetAbstraction``, pointnext.py:81-170).

    dp_fj aggregation: grouped features are ``concat[(xyz_j - center)/r,
    f_j]``; shared 2-layer MLP; max-pool; residual from the gathered
    center features through a linear skip.
    """

    out_channels: int
    stride: int
    radius: float
    nsample: int
    sa_layers: int = 2
    use_res: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jax.Array, feats: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        B, N, _ = xyz.shape
        npoint = N // self.stride
        # static clamp for tiny inputs (scene-scale N never binds this)
        nsample = min(self.nsample, N)
        fps_idx = ops.farthest_point_sample(xyz, npoint)
        new_xyz = ops.index_points(xyz, fps_idx)
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu and npoint % 8 == 0 and feats.dtype == jnp.bfloat16:
            from ppt_tpu.kernels.group import ball_query_gather_feats

            # one kernel: query + coord gather + FEATURE gather — XLA's
            # native row gather of fj is the dominant PointNeXt cost on
            # TPU (~18 ms for the stage-1 gather alone at B=128)
            idx, rel, fj = ball_query_gather_feats(
                float(self.radius), nsample, xyz, new_xyz, feats,
                relative=True,
            )
            dp = rel.astype(xyz.dtype) / self.radius  # normalize_dp
        else:
            idx = ops.query_ball_point(self.radius, nsample, xyz, new_xyz)
            dp = (
                ops.index_points(xyz, idx) - new_xyz[:, :, None, :]
            ) / self.radius  # normalize_dp (group.py:250-253)
            fj = ops.index_points(feats, idx)
        x = jnp.concatenate([dp.astype(self.dtype), fj], axis=-1)

        mid = self.out_channels // 2 if self.stride > 1 else self.out_channels
        widths = [mid] * (self.sa_layers - 1) + [self.out_channels]
        for i, w in enumerate(widths):
            last = i == len(widths) - 1
            x = _ConvBnAct(
                w, use_act=not (last and self.use_res),
                dtype=self.dtype, name=f"conv{i}",
            )(x, train)
        pooled = jnp.max(x, axis=2)  # [B, npoint, out]

        if self.use_res:
            fi = ops.index_points(feats, fps_idx)
            if fi.shape[-1] != self.out_channels:
                identity = nn.Dense(
                    self.out_channels, dtype=self.dtype, name="skipconv"
                )(fi)
            else:
                identity = fi
            pooled = nn.relu(pooled + identity)
        return new_xyz, pooled


class GlobalAggregation(nn.Module):
    """stride-1 tail SA: group-all + 2-layer MLP + global max
    (``SetAbstraction`` with ``all_aggr``, pointnext.py:103-108,141-147)."""

    out_channels: int
    sa_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jax.Array, feats: jax.Array, train: bool = False
    ) -> jax.Array:
        x = jnp.concatenate([xyz.astype(self.dtype), feats], axis=-1)
        for i in range(self.sa_layers):
            x = _ConvBnAct(self.out_channels, dtype=self.dtype, name=f"conv{i}")(
                x, train
            )
        return jnp.max(x, axis=1)  # [B, out]


class InvResMLP(nn.Module):
    """Inverted-residual depth block (``InvResMLP``, pointnext.py:229-276).
    Unused at blocks=[1]*6 (PointNeXt-S) but required for B/L/XL scaling."""

    channels: int
    radius: float
    nsample: int
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jax.Array, feats: jax.Array, train: bool = False
    ) -> jax.Array:
        identity = feats
        # local aggregation: ball-query around every point, 1-layer MLP
        idx = ops.query_ball_point(
            self.radius, min(self.nsample, xyz.shape[1]), xyz, xyz
        )
        dp = (ops.index_points(xyz, idx) - xyz[:, :, None, :]) / self.radius
        fj = ops.index_points(feats, idx)
        x = jnp.concatenate([dp.astype(self.dtype), fj], axis=-1)
        x = _ConvBnAct(self.channels, dtype=self.dtype, name="aggr_conv")(x, train)
        x = jnp.max(x, axis=2)
        # pointwise inverted bottleneck
        x = _ConvBnAct(
            self.channels * self.expansion, dtype=self.dtype, name="pw1"
        )(x, train)
        x = _ConvBnAct(
            self.channels, use_act=False, dtype=self.dtype, name="pw2"
        )(x, train)
        return nn.relu(x + identity)


class PointNext(nn.Module):
    """PointNeXt-S trunk -> 256-d feature (BaseCls equivalent)."""

    config: PointNextConfig = PointNextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts: jax.Array, train: bool = False) -> jax.Array:
        """pts: [B, N, in_channels] — xyz in the first 3 channels, extra
        features (height) after (``forward_cls_feat``, pointnext.py:434-443
        uses the full input as f0 and xyz as p0)."""
        cfg = self.config
        xyz = pts[..., :3]
        feats = pts.astype(self.dtype)

        channels = cfg.stage_channels()
        radii = cfg.stage_radii()
        for i, (ch, stride, nblocks) in enumerate(
            zip(channels, cfg.strides, cfg.blocks)
        ):
            if i == 0 and stride == 1:
                # stem: plain linear, no norm/act (is_head path)
                feats = nn.Dense(ch, dtype=self.dtype, name="stem")(feats)
            elif stride == 1:
                feats = GlobalAggregation(
                    ch, cfg.sa_layers, dtype=self.dtype, name=f"stage{i}_global"
                )(xyz, feats, train)
                xyz = None
            else:
                xyz, feats = SetAbstractionNext(
                    ch, stride, radii[i], cfg.nsample,
                    sa_layers=cfg.sa_layers, use_res=cfg.sa_use_res,
                    dtype=self.dtype, name=f"stage{i}_sa",
                )(xyz, feats, train)
                r = radii[i] * cfg.radius_scaling
                for j in range(1, nblocks):
                    feats = InvResMLP(
                        ch, r, cfg.nsample, cfg.expansion,
                        dtype=self.dtype, name=f"stage{i}_block{j}",
                    )(xyz, feats, train)

        # The B/L/XL plans (strides [1,4,4,4,4]) are seg encoders without
        # a group-all tail — global-max the surviving points for the cls
        # readout (the openpoints cls wrapper pools the same way)
        if feats.ndim == 3:
            feats = jnp.max(feats, axis=1)

        # ClsHead (num_classes=-1): 512 -> 512 -> 256 with BN/ReLU/dropout
        # (linear bias omitted when BN follows, as in create_linearblock)
        x = feats
        for i, w in enumerate(cfg.head_mlps):
            x = nn.Dense(w, use_bias=False, dtype=self.dtype, name=f"head_fc{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32,
                name=f"head_bn{i}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(cfg.head_dropout)(x, deterministic=not train)
        return x
