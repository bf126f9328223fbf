"""Masked-point-group autoencoder (Point-MAE style pretraining).

Reference family: ``openpoints/models/reconstruction/{maskedpoint,
maskedpointgroup,maskedpointvit}.py`` — FPS centers, neighborhood
groups, per-sample random PATCH masking by noise argsort
(``group_random_masking``, maskedpointgroup.py:71-105), an encoder over
the kept patches, a decoder that restores mask tokens into the original
patch order, and a per-patch Chamfer-L1 reconstruction loss
(``forward_loss``, :109-129). This differs from ``nn/mpm.py``'s
BERT-style objective (frozen-dVAE token targets + masked CE): MAE
regresses the masked patches' raw coordinates.

This port is the transformer instantiation (the maskedpointvit flavor):
patch tokens from the shared MiniPointNet, ViT encoder over KEPT tokens
only (the MAE efficiency trick), lightweight ViT decoder over
[restored tokens + mask token] with center positional embeddings, one
Dense head regressing K x 3 center-relative coordinates per patch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu.nn.pointbert import MiniPointNet, VitBlock, group_points
from ppt_tpu.ops.losses3d import chamfer_l1


@dataclasses.dataclass(frozen=True)
class MaeConfig:
    num_group: int = 64
    group_size: int = 32
    mask_ratio: float = 0.6
    encoder_dims: int = 128
    trans_dim: int = 192
    depth: int = 6
    decoder_depth: int = 2
    num_heads: int = 6


def random_patch_masking(key: jax.Array, num_group: int, mask_ratio: float,
                         batch: int):
    """Per-sample shuffle by noise argsort (maskedpointgroup.py:71-105).

    Returns (ids_keep [B, L_keep], ids_restore [B, L], mask [B, L] with
    0 = keep / 1 = removed, in ORIGINAL patch order)."""
    len_keep = int(num_group * (1 - mask_ratio))
    noise = jax.random.uniform(key, (batch, num_group))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((batch, num_group))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, ids_restore, mask


class MaskedPointMAE(nn.Module):
    """``__call__(pts [B,N,3], rng via 'masking') -> (loss, pred)``;
    ``pred``: [B, L, K, 3] center-relative patch reconstructions."""

    config: MaeConfig = MaeConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts: jax.Array, train: bool = False):
        cfg = self.config
        B = pts.shape[0]
        L = cfg.num_group
        key = self.make_rng("masking")

        neighborhood, center = group_points(pts, L, cfg.group_size)
        tokens = MiniPointNet(cfg.encoder_dims, dtype=self.dtype,
                              name="encoder")(neighborhood, train)
        tokens = nn.Dense(cfg.trans_dim, dtype=self.dtype,
                          name="reduce_dim")(tokens)  # [B, L, D]

        def pos_embed(xyz, name):
            h = nn.Dense(128, dtype=self.dtype, name=f"{name}1")(xyz)
            h = nn.gelu(h)
            return nn.Dense(cfg.trans_dim, dtype=self.dtype, name=f"{name}2")(h)

        ids_keep, ids_restore, mask = random_patch_masking(
            key, L, cfg.mask_ratio, B
        )
        kept = jnp.take_along_axis(tokens, ids_keep[..., None], axis=1)
        kept_centers = jnp.take_along_axis(center, ids_keep[..., None], axis=1)
        pos_enc = pos_embed(kept_centers.astype(self.dtype), "pos_enc")

        # encoder runs on KEPT tokens only (the MAE efficiency trick)
        h = kept
        for i in range(cfg.depth):
            h = VitBlock(cfg.num_heads, dtype=self.dtype,
                         name=f"block_{i}")(h, deterministic=not train,
                                                pos=pos_enc)
        h = nn.LayerNorm(dtype=jnp.float32, name="enc_norm")(h).astype(self.dtype)

        # restore original order with mask tokens, add full pos embeds
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.trans_dim)
        )
        n_masked = L - h.shape[1]
        full = jnp.concatenate(
            [h, jnp.broadcast_to(mask_token.astype(self.dtype),
                                 (B, n_masked, cfg.trans_dim))], axis=1
        )
        full = jnp.take_along_axis(full, ids_restore[..., None], axis=1)
        pos_dec = pos_embed(center.astype(self.dtype), "pos_dec")
        d = full
        for i in range(cfg.decoder_depth):
            d = VitBlock(cfg.num_heads, dtype=self.dtype,
                         name=f"dec_block_{i}")(d, deterministic=not train,
                                                pos=pos_dec)
        d = nn.LayerNorm(dtype=jnp.float32, name="dec_norm")(d).astype(self.dtype)
        pred = nn.Dense(cfg.group_size * 3, dtype=self.dtype,
                        name="head")(d)
        pred = pred.reshape(B, L, cfg.group_size, 3).astype(jnp.float32)

        # per-patch chamfer-L1 against the (relative) groups (:109-129)
        loss = chamfer_l1(
            pred.reshape(B * L, cfg.group_size, 3),
            neighborhood.astype(jnp.float32).reshape(B * L, cfg.group_size, 3),
        )
        return loss, pred
