"""PointBERT (PointTransformer) backbone in flax, channels-last.

Reference architecture: ``models/pointbert/point_encoder.py:113-257`` with
``Group``/``Encoder`` from ``models/pointbert/dvae.py:152-215`` and config
``models/pointbert/PointTransformer_8192point.yaml`` (trans_dim 384,
depth 12, heads 6, 512 groups x 32 neighbors, encoder_dims 256).

TPU-first re-design decisions:
  - everything is channels-last ``[B, N, C]``; the reference's 1x1 Conv1d
    stacks become Dense layers (identical math, MXU-shaped);
  - the group divider (FPS + kNN + gather + normalize) is a function of
    the shared ops layer, swappable between the pure-XLA path and the
    Pallas kernels;
  - position embeddings are added *every block* (``x = block(x + pos)``,
    reference ``point_encoder.py:98-110``) — an unusual detail that must
    be preserved for checkpoint parity;
  - the classifier feature is ``concat[cls_token, max-pool(tokens)]``
    (768-d), reference ``point_encoder.py:251``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu import ops
from ppt_tpu.nn.layers import DropPath, MlpBlock


@dataclasses.dataclass(frozen=True)
class PointBertConfig:
    trans_dim: int = 384
    depth: int = 12
    drop_path_rate: float = 0.1
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 512
    encoder_dims: int = 256
    cls_dim: int = 50  # partseg part-label count


def group_points(
    xyz: jax.Array, num_group: int, group_size: int
) -> Tuple[jax.Array, jax.Array]:
    """FPS centers + kNN neighborhoods, center-normalized.

    Equivalent of ``Group.forward`` (``models/pointbert/dvae.py:152-181``).
    Returns (neighborhood ``[B, G, M, 3]``, center ``[B, G, 3]``).

    On TPU this routes to the fused Pallas kernels
    (``ppt_tpu.kernels.group``): 4.8 ms vs 13.7 ms for the XLA
    FPS + top_k + gather pipeline at the PPT-Base shapes (B32, N1024,
    512x32) — the gathered neighborhood comes out of the kNN kernel's
    VMEM tiles instead of a separate HBM gather.
    """
    import os

    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if os.environ.get("PPT_FORCE_XLA_GROUP"):  # A/B escape hatch
        on_tpu = False
    if on_tpu and num_group % 8 == 0:
        from ppt_tpu.kernels.group import fused_group

        return fused_group(xyz, num_group, group_size)
    idx = ops.farthest_point_sample(xyz, num_group)
    center = ops.index_points(xyz, idx)
    nbr_idx = ops.knn_point(group_size, xyz, center)
    neighborhood = ops.index_points(xyz, nbr_idx)
    return neighborhood - center[:, :, None, :], center


class _SplitDense(nn.Module):
    """Dense over ``concat([global, local])`` computed WITHOUT the concat.

    The global half is identical for every neighbor in a group, so its
    matmul runs once per group ([B, G, Cg] x Wg) and broadcasts — the
    reference's torch formulation recomputes it M=32 times and
    materializes the [B, G, M, Cg+Cl] concat (0.5 GB at PPT-Base shapes).
    Parameter layout is the single fused kernel/bias, so torch checkpoint
    conversion is unchanged (rows [0:Cg] = global, [Cg:] = local).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, global_feat: jax.Array, local_feat: jax.Array) -> jax.Array:
        cg = global_feat.shape[-1]
        cl = local_feat.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cg + cl, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        out_g = global_feat @ k[:cg]  # [B, G, F]
        out_l = local_feat @ k[cg:]  # [B, G, M, F]
        return out_l + out_g[:, :, None, :] + bias.astype(self.dtype)


class MiniPointNet(nn.Module):
    """Per-group feature extractor (``Encoder``, dvae.py:184-215).

    Two shared-MLP stages with a global-max bottleneck in between; the
    1x1 convs are Dense layers over channels-last group tensors. The
    second stage's concat-with-global is folded into a split matmul
    (see ``_SplitDense``).
    """

    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, groups: jax.Array, train: bool = False) -> jax.Array:
        # groups: [B, G, M, 3] -> [B, G, out_dim]
        import os

        from ppt_tpu.kernels.attention import _is_tpu

        B, G, M, C = groups.shape
        use_fused = (
            not self.is_initializing()
            and (_is_tpu() or os.environ.get("PPT_FORCE_FUSED_MINI"))
            and C == 3
            and M % 8 == 0
            and G % 8 == 0
            and not os.environ.get("PPT_FORCE_XLA_MINI")
        )
        if use_fused:
            from ppt_tpu.kernels.mini import mini_forward, mini_stats

            interp = not _is_tpu()  # CPU tests run the kernels interpreted

            eps = 1e-5  # nn.BatchNorm default
            p = self.variables["params"]
            w1, b1 = p["conv1a"]["kernel"], p["conv1a"]["bias"]
            ga1, be1 = p["bn1"]["scale"], p["bn1"]["bias"]
            w2, b2 = p["conv1b"]["kernel"], p["conv1b"]["bias"]
            wsp, bsp = p["conv2a"]["kernel"], p["conv2a"]["bias"]
            cg = wsp.shape[0] - w2.shape[1]
            wg, wl = wsp[:cg], wsp[cg:]  # _SplitDense: global rows first
            ga2, be2 = p["bn2"]["scale"], p["bn2"]["bias"]
            w3, b3 = p["conv2b"]["kernel"], p["conv2b"]["bias"]

            groups2 = groups.reshape(B, G * M, C).astype(jnp.float32)
            n = B * G * M
            if train:
                # BN1 feeds on an affine map of the 3-channel input:
                # batch mean/var come from the 3x3 input moment matrix
                # (exact up to f32 rounding), no activation sweep needed
                z = groups2.reshape(-1, 3)
                sz = jnp.sum(z, axis=0)  # [3]
                szz = z.T @ z  # [3, 3]
                w1f = w1.astype(jnp.float32)
                b1f = b1.astype(jnp.float32)
                mean1 = (sz @ w1f) / n + b1f
                e2 = (
                    jnp.sum(w1f * (szz @ w1f), axis=0)
                    + 2.0 * b1f * (sz @ w1f) + n * b1f * b1f
                ) / n
                # clamp: E[x^2]-E[x]^2 can round a hair negative in f32
                # for near-constant channels; raw sqrt below would NaN
                # the running stats permanently
                var1 = jnp.maximum(e2 - mean1 * mean1, 0.0)
            else:
                bs = self.variables["batch_stats"]
                mean1, var1 = bs["bn1"]["mean"], bs["bn1"]["var"]
            scale1 = ga1 / jnp.sqrt(var1 + eps)
            shift1 = be1 - mean1 * scale1
            fw1 = w1 * scale1[None, :]
            fb1 = b1 * scale1 + shift1

            if train:
                sumh, sumsqh = mini_stats(
                    M, self.dtype, interp, groups2, fw1, fb1, w2, b2, wg,
                    wl, bsp,
                )
                mean2 = sumh / n
                var2 = jnp.maximum(sumsqh / n - mean2 * mean2, 0.0)
            else:
                mean2, var2 = bs["bn2"]["mean"], bs["bn2"]["var"]
            scale2 = ga2 / jnp.sqrt(var2 + eps)
            shift2 = be2 - mean2 * scale2
            fwg = wg * scale2[None, :]
            fwl = wl * scale2[None, :]
            fbs = bsp * scale2 + shift2

            out = mini_forward(
                M, self.dtype, interp, groups2, fw1, fb1, w2, b2, fwg, fwl,
                fbs, w3, b3,
            )
            if train:
                # drive the flax BN modules with 2-row synthetic tensors
                # reproducing (mean, var) exactly, so ra_mean/ra_var
                # update identically to the unfused path and bn1/bn2
                # keep owning their params/batch_stats
                s1 = jnp.sqrt(var1)
                s2 = jnp.sqrt(var2)
                nn.BatchNorm(
                    use_running_average=False, dtype=jnp.float32, name="bn1"
                )(jnp.stack([mean1 + s1, mean1 - s1]))
                nn.BatchNorm(
                    use_running_average=False, dtype=jnp.float32, name="bn2"
                )(jnp.stack([mean2 + s2, mean2 - s2]))
            return out
        x = nn.Dense(128, dtype=self.dtype, name="conv1a")(groups)
        # BN output in compute dtype: flax computes the statistics in
        # fp32 regardless (linen _compute_stats promotes), but a fp32
        # OUTPUT would materialize the [B,G,M,128/512] activations at
        # 2x width — ~0.5 GB of extra HBM traffic per step at PPT-Base
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=self.dtype, name="conv1b")(x)  # [B,G,M,256]
        g = jnp.max(x, axis=2)  # [B,G,256]
        x = _SplitDense(512, dtype=self.dtype, name="conv2a")(g, x)
        x = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn2"
        )(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="conv2b")(x)
        return jnp.max(x, axis=2)  # [B, G, out_dim]


class VitAttention(nn.Module):
    """timm-style attention: fused qkv without bias, proj with bias
    (``point_encoder.py:33-58``)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(B, N, self.num_heads, head_dim)

        import os

        from ppt_tpu.kernels.attention import (
            FLASH_MIN_SEQ, _is_tpu, flash_mha, fused_mha,
        )

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        use_fused = (
            _is_tpu()
            and N < FLASH_MIN_SEQ
            and not os.environ.get("PPT_FORCE_XLA_ATTN")
        )
        if use_fused:
            # whole-row fused Pallas attention: scores stay in VMEM
            # (saves the ~0.5 ms/block [B,H,L,L] HBM round-trips the
            # einsum path pays at the ViT shape), f32 softmax
            out = fused_mha(qh, kh, vh)
        elif self.dtype == jnp.bfloat16 and N < FLASH_MIN_SEQ:
            # bf16 score storage halves attention HBM traffic (0.27 vs
            # 0.39 ms/block on v5e); consistent with bf16-everywhere
            # compute (max observed activation drift ~8e-3)
            scale = 1.0 / (head_dim**0.5)
            s = jnp.einsum("blhd,bmhd->bhlm", qh, kh) * scale
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhlm,bmhd->blhd", p, vh)
        else:
            out = flash_mha(qh, kh, vh)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out.reshape(B, N, C))


class VitBlock(nn.Module):
    """Pre-norm ViT block (``Block``, point_encoder.py:61-79).

    ``pos`` (optional): PointBERT adds the position embedding before
    EVERY block (point_encoder.py:98-110); passing it here instead of
    pre-adding lets the fused whole-block kernel consume it in VMEM.
    """

    num_heads: int
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True,
        pos: Optional[jax.Array] = None,
        readout_ln: Optional[dict] = None,
    ) -> jax.Array:
        """``readout_ln``: the trunk's final-LayerNorm params
        ({'scale', 'bias'}). When given AND the fused kernel engages,
        the block fuses the cls readout (final f32 LN + cls/max-pool,
        reference ``point_encoder.py:251``) into its epilogue and
        returns the [B, 2C] f32 feature instead of [B, L, C] tokens —
        the caller must then skip its own LN/readout. Ignored on the
        unfused path (caller checks the returned ndim)."""
        import os

        from ppt_tpu.kernels.attention import FLASH_MIN_SEQ, _is_tpu

        C = x.shape[-1]
        # Whole-block fused Pallas kernel (kernels/vitblock.py): x+pos,
        # LN1, qkv, whole-row attention, proj, droppath residual, LN2,
        # MLP, residual — one VMEM pass per batch element. DEFAULT ON
        # on TPU: kernel_check's vit_block row passed on the real chip
        # (max rel err 8.81e-03 vs the XLA twin in bf16) and the bench
        # measured 1568.7 vs 1447.6 clouds/sec without it.
        # Length guard mirrors VitAttention: beyond FLASH_MIN_SEQ the
        # whole-row [Lp, Lp] score matrix stops fitting VMEM and
        # flash_mha is the right formulation anyway.
        # PPT_FUSED_BLOCK=0 disables; =1 forces (CPU interpret, tests);
        # PPT_FORCE_XLA_ATTN=1 also disables (the fused block subsumes
        # attention, so the documented kernels-off escape hatch holds).
        use_fused = (
            not self.is_initializing()
            and pos is not None
            and x.shape[1] < FLASH_MIN_SEQ
            and not os.environ.get("PPT_FORCE_XLA_ATTN")
            and os.environ.get("PPT_FUSED_BLOCK", "1" if _is_tpu() else "0")
            == "1"
        )
        if use_fused:
            from ppt_tpu.kernels.vitblock import fused_vit_block

            p = self.variables["params"]
            dt = self.dtype
            B = x.shape[0]
            if deterministic or self.drop_path == 0.0:
                dp = jnp.ones((B, 2), jnp.float32)
            else:
                keep = 1.0 - self.drop_path
                m1 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, (B,)
                ).astype(jnp.float32) / keep
                m2 = jax.random.bernoulli(
                    self.make_rng("droppath"), keep, (B,)
                ).astype(jnp.float32) / keep
                dp = jnp.stack([m1, m2], axis=1)
            weights = (
                p["norm1"]["scale"], p["norm1"]["bias"],
                p["attn"]["qkv"]["kernel"].astype(dt),
                p["attn"]["proj"]["kernel"].astype(dt),
                p["attn"]["proj"]["bias"],
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp"]["fc1"]["kernel"].astype(dt),
                p["mlp"]["fc1"]["bias"],
                p["mlp"]["fc2"]["kernel"].astype(dt),
                p["mlp"]["fc2"]["bias"],
            )
            if readout_ln is not None:
                from ppt_tpu.kernels.vitblock import fused_vit_block_readout

                ro = fused_vit_block_readout(
                    x, pos.astype(x.dtype), dp, *weights,
                    readout_ln["scale"], readout_ln["bias"],
                    self.num_heads,
                )  # [B, 8, C] f32
                return jnp.concatenate([ro[:, 0], ro[:, 1]], axis=-1)
            return fused_vit_block(
                x, pos.astype(x.dtype), dp, *weights, self.num_heads
            )
        if pos is not None:
            x = x + pos
        # LN stats are fp32 inside flax either way; emitting the
        # normalized tokens in compute dtype halves 24 LN outputs' HBM
        # traffic per step (text-tower LNs stay fp32 — parity quirk)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = VitAttention(self.num_heads, dtype=self.dtype, name="attn")(h)
        x = x + DropPath(self.drop_path, name="dp1")(h, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = MlpBlock(
            int(C * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(h, deterministic)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic)


class PointBert(nn.Module):
    """PointTransformer classification trunk -> 768-d feature."""

    config: PointBertConfig = PointBertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        neighborhood, center = group_points(pts, cfg.num_group, cfg.group_size)
        tokens = MiniPointNet(cfg.encoder_dims, dtype=self.dtype, name="encoder")(
            neighborhood, train
        )
        tokens = nn.Dense(cfg.trans_dim, dtype=self.dtype, name="reduce_dim")(tokens)

        B = tokens.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.trans_dim)
        )
        cls_pos = self.param(
            "cls_pos", nn.initializers.normal(1.0), (1, 1, cfg.trans_dim)
        )
        pos = nn.Dense(128, dtype=self.dtype, name="pos_embed1")(center)
        pos = nn.gelu(pos)
        pos = nn.Dense(cfg.trans_dim, dtype=self.dtype, name="pos_embed2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, cfg.trans_dim)), tokens],
            axis=1,
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos.astype(self.dtype), (B, 1, cfg.trans_dim)), pos],
            axis=1,
        )

        rates = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        # fused readout: hand the final-LN params to the LAST block so
        # its kernel emits the [B, 2C] feature directly (the params are
        # created by the nn.LayerNorm below during init, when the fused
        # path is off by construction)
        norm_p = (
            None
            if self.is_initializing()
            else self.variables["params"].get("norm")
        )

        # Whole-TRUNK megakernel (kernels/vitblock.fused_vit_tower): all
        # depth blocks + readout in one Pallas call — x stays in VMEM
        # across blocks, weights resident. On-chip exact, but a
        # same-session A/B measured it ~1.5% SLOWER than the per-block
        # fused pipeline (1,824 vs 1,851 clouds/sec — the per-block
        # grid already overlaps the inter-block HBM traffic with
        # compute; docs/PROFILE_r04.md Finding 5). DEFAULT OFF;
        # PPT_FUSED_VIT_TOWER=1 re-enables for re-measurement.
        import os

        from ppt_tpu.kernels.attention import FLASH_MIN_SEQ, _is_tpu

        use_tower = (
            norm_p is not None
            and x.shape[1] < FLASH_MIN_SEQ
            and not os.environ.get("PPT_FORCE_XLA_ATTN")
            and os.environ.get("PPT_FUSED_BLOCK", "1" if _is_tpu() else "0")
            == "1"
            and os.environ.get("PPT_FUSED_VIT_TOWER", "0") == "1"
        )
        if use_tower:
            from ppt_tpu.kernels.vitblock import fused_vit_tower

            p = self.variables["params"]
            dt = self.dtype
            if not train or cfg.drop_path_rate == 0.0:
                dp = jnp.ones((B, cfg.depth, 2), jnp.float32)
            else:
                keeps = 1.0 - jnp.asarray(rates, jnp.float32)  # [depth]
                masks = jax.random.bernoulli(
                    self.make_rng("droppath"),
                    keeps[None, :, None],
                    (B, cfg.depth, 2),
                ).astype(jnp.float32)
                dp = masks / jnp.maximum(keeps[None, :, None], 1e-6)

            def stk(*path, cast=None):
                arrs = [p[f"block_{i}"] for i in range(cfg.depth)]
                for key in path:
                    arrs = [a[key] for a in arrs]
                out = jnp.stack(arrs)
                return out if cast is None else out.astype(cast)

            ro = fused_vit_tower(
                x, pos.astype(x.dtype), dp,
                stk("norm1", "scale"), stk("norm1", "bias"),
                stk("attn", "qkv", "kernel", cast=dt),
                stk("attn", "proj", "kernel", cast=dt),
                stk("attn", "proj", "bias"),
                stk("norm2", "scale"), stk("norm2", "bias"),
                stk("mlp", "fc1", "kernel", cast=dt),
                stk("mlp", "fc1", "bias"),
                stk("mlp", "fc2", "kernel", cast=dt),
                stk("mlp", "fc2", "bias"),
                norm_p["scale"], norm_p["bias"],
                cfg.num_heads,
            )  # [B, 8, C] f32
            return jnp.concatenate([ro[:, 0], ro[:, 1]], axis=-1)

        for i in range(cfg.depth):
            is_last = i == cfg.depth - 1
            x = VitBlock(
                cfg.num_heads,
                drop_path=float(rates[i]),
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                x, deterministic=not train, pos=pos,
                readout_ln=norm_p if is_last else None,
            )
        if x.ndim == 2:  # the last block fused the readout
            return x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        return jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + shared MLP.

    Equivalent of ``PointNetFeaturePropagation``
    (``models/pointbert/pointnet2_utils.py:297-368``), channels-last.
    """

    mlp: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz1: jax.Array,  # [B, N, 3] targets
        xyz2: jax.Array,  # [B, S, 3] sources
        points1: Optional[jax.Array],  # [B, N, D1]
        points2: jax.Array,  # [B, S, D2]
        train: bool = False,
    ) -> jax.Array:
        interp = ops.three_interpolate(xyz1, xyz2, points2)
        x = interp if points1 is None else jnp.concatenate([points1, interp], axis=-1)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name=f"bn{i}"
            )(x)
            x = nn.relu(x)
        return x


class DgcnnPropagation(nn.Module):
    """Two-round EdgeConv upsampler (``DGCNN_Propagation``,
    ``models/pointbert/pointnet2_utils.py:371-467``), channels-last.

    The reference hardcodes 768->512 and 1024->384 conv widths (valid only
    for trans_dim=384); here they derive from ``hidden_dim``/``out_dim``
    with those values as defaults for checkpoint parity.
    """

    k: int = 4
    hidden_dim: int = 512
    out_dim: int = 384
    dtype: jnp.dtype = jnp.float32

    def _edge_features(self, coor_q, x_q, coor_k, x_k):
        # coor_*: [B, N, 3]; x_q: [B, Nq, D]; x_k: [B, Nk, D]
        idx = ops.knn_point(self.k, coor_k, coor_q)  # [B, Nq, k]
        idx = jax.lax.stop_gradient(idx)
        nbrs = ops.index_points(x_k, idx)  # [B, Nq, k, D]
        q = jnp.broadcast_to(x_q[:, :, None, :], nbrs.shape)
        return jnp.concatenate([nbrs - q, q], axis=-1)  # [B, Nq, k, 2D]

    @nn.compact
    def __call__(
        self,
        coor: jax.Array,  # [B, G, 3] coarse coords
        f: jax.Array,  # [B, G, D] coarse feats
        coor_q: jax.Array,  # [B, N, 3] fine coords
        f_q: jax.Array,  # [B, N, D] fine feats
    ) -> jax.Array:
        h = self._edge_features(coor_q, f_q, coor, f)  # [B, N, k, 2D]
        h = nn.Dense(
            self.hidden_dim, use_bias=False, dtype=self.dtype, name="layer1"
        )(h)
        h = nn.GroupNorm(num_groups=4, dtype=jnp.float32, name="gn1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.max(h, axis=2)  # [B, N, hidden]

        h2 = self._edge_features(coor_q, h, coor_q, h)  # [B, N, k, 2*hidden]
        h2 = nn.Dense(
            self.out_dim, use_bias=False, dtype=self.dtype, name="layer2"
        )(h2)
        h2 = nn.GroupNorm(num_groups=4, dtype=jnp.float32, name="gn2")(h2)
        h2 = nn.leaky_relu(h2, 0.2)
        return jnp.max(h2, axis=2)  # [B, N, out]


class PointBertPartSeg(nn.Module):
    """Dense per-point trunk: taps ViT features at blocks {3,7,11},
    hierarchically upsamples to all N points, returns 128-d per-point
    features (``PointTransformer_partseg``, point_encoder.py:260-420).
    """

    config: PointBertConfig = PointBertConfig()
    num_categories: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pts: jax.Array, cls_onehot: jax.Array, train: bool = False
    ) -> jax.Array:
        cfg = self.config
        B, N, _ = pts.shape
        neighborhood, center = group_points(pts, cfg.num_group, cfg.group_size)
        tokens = MiniPointNet(cfg.encoder_dims, dtype=self.dtype, name="encoder")(
            neighborhood, train
        )
        tokens = nn.Dense(cfg.trans_dim, dtype=self.dtype, name="reduce_dim")(tokens)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.trans_dim)
        )
        cls_pos = self.param(
            "cls_pos", nn.initializers.normal(1.0), (1, 1, cfg.trans_dim)
        )
        pos = nn.Dense(128, dtype=self.dtype, name="pos_embed1")(center)
        pos = nn.gelu(pos)
        pos = nn.Dense(cfg.trans_dim, dtype=self.dtype, name="pos_embed2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, cfg.trans_dim)), tokens], axis=1
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos.astype(self.dtype), (B, 1, cfg.trans_dim)), pos], axis=1
        )

        fetch_idx = (3, 7, 11)
        feats: List[jax.Array] = []
        rates = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        norm = nn.LayerNorm(dtype=jnp.float32, name="norm")
        for i in range(cfg.depth):
            x = VitBlock(
                cfg.num_heads,
                drop_path=float(rates[i]),
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=not train, pos=pos)
            if i in fetch_idx:
                feats.append(norm(x)[:, 1:])  # drop cls token: [B, G, D]

        # hierarchical coordinates: N -> 512 -> 256 -> G
        idx_512 = ops.farthest_point_sample(pts, 512)
        xyz_512 = ops.index_points(pts, idx_512)
        idx_256 = ops.farthest_point_sample(pts, 256)
        xyz_256 = ops.index_points(pts, idx_256)

        # level 0 features: one-hot category + raw coords per point
        onehot = jnp.broadcast_to(
            cls_onehot[:, None, :].astype(self.dtype), (B, N, self.num_categories)
        )
        f_level_0 = jnp.concatenate([onehot, pts.astype(self.dtype)], axis=-1)

        f_256 = FeaturePropagation(
            (cfg.trans_dim * 4, cfg.trans_dim), dtype=self.dtype, name="propagation_2"
        )(xyz_256, center, xyz_256, feats[1], train)
        f_512 = FeaturePropagation(
            (cfg.trans_dim * 4, cfg.trans_dim), dtype=self.dtype, name="propagation_1"
        )(xyz_512, center, xyz_512, feats[0], train)

        f_256 = DgcnnPropagation(
            k=4, out_dim=cfg.trans_dim, dtype=self.dtype, name="dgcnn_pro_2"
        )(center, feats[2], xyz_256, f_256)
        f_512 = DgcnnPropagation(
            k=4, out_dim=cfg.trans_dim, dtype=self.dtype, name="dgcnn_pro_1"
        )(xyz_256, f_256, xyz_512, f_512)
        f_all = FeaturePropagation(
            (cfg.trans_dim * 4, cfg.trans_dim), dtype=self.dtype, name="propagation_0"
        )(pts, xyz_512, f_level_0, f_512, train)

        h = nn.Dense(128, dtype=self.dtype, name="conv1")(f_all)
        h = nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name="bn1"
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=not train)
        return h  # [B, N, 128]
