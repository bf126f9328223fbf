"""CurveNet encoder (classification variant), channels-last flax.

Reference: ``openpoints/models/backbone/curvenet.py`` (Xiang et al. 2021).
The distinctive machinery is ported TPU-first:

  - **Walk**: guided walks in the cloud — from attention-selected start
    points, ``curve_length`` steps choose the next neighbor with a
    Gumbel-softmax agent MLP, a 2-way momentum gate blending the running
    curve descriptor, and cosine crossover suppression. The torch step
    loop with flattened fancy-indexing becomes a ``lax.scan`` whose state
    is (current index, current/previous descriptors); each step is a
    batched gather + tiny matmuls — static shapes throughout.
  - **CurveAggregation**: inter/intra-curve attention readout mixing
    curve features back into point features (dense [N, curve] matmuls —
    MXU food).
  - **CIC** (curve intervention convolution): bottleneck 1x1 convs +
    optional curve grouping/aggregation + LPFA local aggregation with a
    residual.

The reference file implements the segmentation network; this module is
the classification-oriented encoder (CIC pyramid -> global max pool ->
256-d trunk) so it plugs into ``ulip_customized``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ppt_tpu import ops


def gumbel_softmax(key: jax.Array, logits: jax.Array, temperature: float = 1.0):
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape, minval=1e-20, maxval=1.0)
    ))
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


class Walk(nn.Module):
    """Guided walk producing curve features [B, curve_num, curve_length, C]."""

    k: int
    curve_num: int
    curve_length: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,  # [B, N, 3] (unused by the walk itself; kept for parity)
        feats: jax.Array,  # [B, N, C]
        adj: jax.Array,  # [B, N, k] neighbor indices
        start: jax.Array,  # [B, curve_num] start indices
        rng: jax.Array,
    ) -> jax.Array:
        B, N, C = feats.shape
        # explicit params (not flax submodules): the step runs inside
        # lax.scan, where compact-module side effects can't live
        agent_kernel = self.param(
            "agent_kernel", nn.initializers.lecun_normal(), (2 * C, 1)
        ).astype(self.dtype)
        momentum_kernel = self.param(
            "momentum_kernel", nn.initializers.lecun_normal(), (2 * C, 2)
        ).astype(self.dtype)

        def agent(t):
            return t @ agent_kernel

        def momentum(t):
            return t @ momentum_kernel

        def gather_rows(table, idx):
            # table [B, N, D], idx [B, curve_num] -> [B, curve_num, D]
            return jnp.take_along_axis(table, idx[..., None], axis=1)

        start_feat = gather_rows(feats, start)  # [B, cn, C]

        def step(carry, key):
            cur_idx, cur_feat, pre_feat, first = carry
            # momentum gate between current and running descriptor
            cat = jnp.concatenate([cur_feat, pre_feat], axis=-1)
            att = jax.nn.softmax(
                momentum(cat).astype(jnp.float32), axis=-1
            )  # [B, cn, 2]
            pre = jnp.where(
                first,
                pre_feat,
                att[..., 0:1] * cur_feat + att[..., 1:2] * pre_feat,
            )

            nbr_idx = gather_rows(adj, cur_idx)  # [B, cn, k]
            nbr_feat = jax.vmap(lambda f, i: f[i])(feats, nbr_idx)  # [B, cn, k, C]

            pre_tiled = jnp.broadcast_to(pre[:, :, None, :], nbr_feat.shape)
            logits = agent(
                jnp.concatenate([nbr_feat, pre_tiled], axis=-1)
            )[..., 0].astype(jnp.float32)  # [B, cn, k]

            # crossover suppression: cosine(direction so far, step direction)
            move = jax.lax.stop_gradient(cur_feat - pre)  # [B, cn, C]
            steps_dir = jax.lax.stop_gradient(
                nbr_feat - cur_feat[:, :, None, :]
            )  # [B, cn, k, C]
            dot = jnp.einsum("bnc,bnkc->bnk", move, steps_dir)
            denom = jnp.maximum(
                jnp.linalg.norm(move, axis=-1)[..., None]
                * jnp.linalg.norm(steps_dir, axis=-1),
                1e-8,
            )
            suppress = jnp.clip(1.0 + dot / denom, 0.0, 1.0)
            logits = jnp.where(first, logits, logits * suppress)

            pick = gumbel_softmax(key, logits)  # [B, cn, k]
            new_feat = jnp.einsum("bnk,bnkc->bnc", pick.astype(nbr_feat.dtype), nbr_feat)
            choice = jnp.argmax(pick, axis=-1)  # [B, cn]
            new_idx = jnp.take_along_axis(nbr_idx, choice[..., None], axis=-1)[..., 0]
            return (new_idx, new_feat, pre, jnp.zeros_like(first)), new_feat

        keys = jax.random.split(rng, self.curve_length)
        first = jnp.ones((B, self.curve_num, 1), bool)
        (_, _, _, _), curve_feats = jax.lax.scan(
            step, (start, start_feat, start_feat, first), keys
        )
        # [curve_length, B, cn, C] -> [B, cn, curve_length, C]
        return jnp.transpose(curve_feats, (1, 2, 0, 3))


class CurveAggregation(nn.Module):
    """Inter/intra-curve attention readout (``CurveAggregation``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, curves: jax.Array) -> jax.Array:
        # x: [B, N, C]; curves: [B, cn, cl, C]
        C = x.shape[-1]
        mid = C // 2
        att = nn.Dense(1, use_bias=False, dtype=self.dtype, name="line_conv_att")(curves)[..., 0]
        inter = jnp.einsum(
            "bnlc,bnl->bnc", curves, jax.nn.softmax(att, axis=-1)
        )  # [B, cn, C] — per-curve summary
        intra = jnp.einsum(
            "bnlc,bnl->blc", curves, jax.nn.softmax(att, axis=1)
        )  # [B, cl, C] — per-position summary

        inter_a = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="conva")(inter)
        intra_b = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="convb")(intra)
        xq = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="convc")(x)
        w_inter = jax.nn.softmax(jnp.einsum("bnm,bcm->bnc", xq, inter_a), axis=-1)
        w_intra = jax.nn.softmax(jnp.einsum("bnm,blm->bnl", xq, intra_b), axis=-1)
        inter_v = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="convn")(inter_a)
        intra_v = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="convl")(intra_b)
        x_inter = jnp.einsum("bnc,bcm->bnm", w_inter, inter_v)
        x_intra = jnp.einsum("bnl,blm->bnm", w_intra, intra_v)
        fused = nn.Dense(C, use_bias=False, dtype=self.dtype, name="convd")(
            jnp.concatenate([x_inter, x_intra], axis=-1)
        )
        fused = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="convd_bn")(fused)
        return nn.leaky_relu(x + fused, 0.2)


class Lpfa(nn.Module):
    """Local point-feature aggregation (``LPFA``)."""

    out_channel: int
    k: int
    mlp_num: int = 2
    initial: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Optional[jax.Array], xyz: jax.Array,
        idx: Optional[jax.Array] = None, train: bool = False,
    ) -> jax.Array:
        B, N, _ = xyz.shape
        if idx is None:
            idx = ops.knn_point(self.k, xyz, xyz)
        nbr_xyz = ops.index_points(xyz, idx)  # [B, N, k, 3]
        center = jnp.broadcast_to(xyz[:, :, None, :], nbr_xyz.shape)
        geo = jnp.concatenate(
            [center, nbr_xyz, nbr_xyz - center], axis=-1
        ).astype(self.dtype)  # [B, N, k, 9]

        if self.initial:
            h = geo
        else:
            geo_f = nn.Dense(
                feats.shape[-1], use_bias=False, dtype=self.dtype, name="xyz2feature"
            )(geo)
            geo_f = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="xyz2feature_bn"
            )(geo_f)
            nbr_f = ops.index_points(feats, idx) - feats[:, :, None, :]
            h = nn.leaky_relu(nbr_f + geo_f, 0.2)

        for i in range(self.mlp_num):
            h = nn.Dense(self.out_channel, use_bias=False, dtype=self.dtype, name=f"mlp{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"mlp_bn{i}"
            )(h)
            h = nn.leaky_relu(h, 0.2)
        if self.initial:
            return jnp.max(h, axis=2)
        return jnp.mean(h, axis=2)


class Cic(nn.Module):
    """Curve intervention convolution block (``CIC``)."""

    npoint: int
    radius: float
    k: int
    output_channels: int
    bottleneck_ratio: int = 2
    mlp_num: int = 2
    curve_config: Optional[Tuple[int, int]] = None  # (curve_num, curve_length)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jax.Array, feats: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        B, N, C_in = feats.shape
        if N != self.npoint:
            # masked max pool: FPS + ball-query max pooling of features
            fps_idx = ops.farthest_point_sample(xyz, self.npoint)
            new_xyz = ops.index_points(xyz, fps_idx)
            nbr = ops.query_ball_point(self.radius, self.k, xyz, new_xyz)
            feats = jnp.max(ops.index_points(feats, nbr), axis=2)
            xyz = new_xyz

        shortcut = feats
        planes = C_in // self.bottleneck_ratio
        h = nn.Dense(planes, use_bias=False, dtype=self.dtype, name="conv1")(feats)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(h)
        h = nn.leaky_relu(h, 0.2)

        idx = ops.knn_point(self.k + 1, xyz, xyz)
        if self.curve_config is not None:
            cn, cl = self.curve_config
            att = jax.nn.sigmoid(
                nn.Dense(1, use_bias=False, dtype=self.dtype, name="start_att")(h)
            )[..., 0]  # [B, N]
            h = h * att[..., None]
            _, start = jax.lax.top_k(att, cn)  # [B, cn]
            rng = self.make_rng("gumbel") if train else jax.random.PRNGKey(0)
            curves = Walk(
                self.k, cn, cl, dtype=self.dtype, name="walk"
            )(xyz, h, idx[:, :, 1:], start, rng)
            h = CurveAggregation(dtype=self.dtype, name="curveagg")(h, curves)

        h = Lpfa(
            planes, self.k, mlp_num=self.mlp_num, dtype=self.dtype, name="lpfa"
        )(h, xyz, idx=idx[:, :, : self.k], train=train)

        h = nn.Dense(self.output_channels, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(h)
        if C_in != self.output_channels:
            shortcut = nn.Dense(
                self.output_channels, use_bias=False, dtype=self.dtype, name="shortcut"
            )(shortcut)
            shortcut = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="shortcut_bn"
            )(shortcut)
        return xyz, nn.leaky_relu(h + shortcut, 0.2)


@dataclasses.dataclass(frozen=True)
class CurveNetConfig:
    k: int = 32
    # (npoint, radius, k, out, bottleneck, curve_config) per CIC pair —
    # the reference 'default' setting, scaled to npoints=1024 inputs
    stages: Tuple = (
        (1024, 0.2, 32, 64, 2, (100, 5)),
        (1024, 0.2, 32, 64, 4, (100, 5)),
        (256, 0.4, 32, 128, 2, (100, 5)),
        (256, 0.4, 32, 128, 4, (100, 5)),
        (64, 0.8, 32, 256, 2, None),
        (64, 0.8, 32, 256, 4, None),
        (16, 1.2, 15, 512, 2, None),
        (16, 1.2, 15, 512, 4, None),
    )


class CurveNet(nn.Module):
    """CurveNet classification encoder -> 256-d feature."""

    config: CurveNetConfig = CurveNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        feats = Lpfa(
            32, cfg.k, mlp_num=1, initial=True, dtype=self.dtype, name="lpfa0"
        )(None, xyz, train=train)
        p = xyz
        for i, (npoint, radius, k, out, ratio, curve) in enumerate(cfg.stages):
            p, feats = Cic(
                npoint, radius, k, out, bottleneck_ratio=ratio,
                curve_config=curve, dtype=self.dtype, name=f"cic{i}",
            )(p, feats, train)
        x = jnp.max(feats, axis=1)  # [B, 512]
        x = nn.Dense(512, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="fbn2")(x)
        x = nn.leaky_relu(x, 0.2)
        return x
