"""Masked point modeling (PointBERT pretraining).

Capability parity with the vendored masked-point pretraining heads
(``openpoints/models/reconstruction/maskedpoint*.py``) and the PointBERT
recipe the reference's checkpoints were produced by: a frozen dVAE
tokenizes each group into a discrete id; the student ViT sees the group
sequence with a masked subset replaced by a learnable mask token and
predicts the dVAE ids at the masked positions (cross-entropy).

TPU notes: masking is a static-shape ``where`` over the token sequence
(mask pattern sampled per batch on device); the target ids come from a
``stop_gradient``-wrapped dVAE tokenizer pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu.nn.dvae import DiscreteVAE
from ppt_tpu.nn.pointbert import MiniPointNet, PointBertConfig, VitBlock


def sample_group_mask(
    key: jax.Array, batch: int, num_group: int, ratio: float
) -> jax.Array:
    """[B, G] bool mask with ~ratio of groups masked (random masking)."""
    scores = jax.random.uniform(key, (batch, num_group))
    k = max(int(num_group * ratio), 1)
    threshold = jnp.sort(scores, axis=1)[:, k - 1 : k]
    return scores <= threshold


def dvae_tokenize(dvae: DiscreteVAE, dvae_variables, neighborhood, center):
    """Frozen-dVAE group token ids [B, G] (argmax over codebook logits)."""
    tokens = dvae.apply(
        dvae_variables, neighborhood, center, method=dvae.tokenize
    )
    return jax.lax.stop_gradient(tokens)


class PointBertMPM(nn.Module):
    """Student: PointBERT trunk + token-prediction head."""

    config: PointBertConfig = PointBertConfig()
    num_tokens: int = 8192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        neighborhood: jax.Array,  # [B, G, M, 3]
        center: jax.Array,  # [B, G, 3]
        mask: jax.Array,  # [B, G] bool — True = masked
        train: bool = False,
    ) -> jax.Array:
        cfg = self.config
        B, G = mask.shape
        tokens = MiniPointNet(cfg.encoder_dims, dtype=self.dtype, name="encoder")(
            neighborhood, train
        )
        tokens = nn.Dense(cfg.trans_dim, dtype=self.dtype, name="reduce_dim")(tokens)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.trans_dim)
        )
        tokens = jnp.where(
            mask[..., None], mask_token.astype(tokens.dtype), tokens
        )

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.trans_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0), (1, 1, cfg.trans_dim))
        pos = nn.Dense(128, dtype=self.dtype, name="pos_embed1")(center)
        pos = nn.gelu(pos)
        pos = nn.Dense(cfg.trans_dim, dtype=self.dtype, name="pos_embed2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, cfg.trans_dim)), tokens], axis=1
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos.astype(self.dtype), (B, 1, cfg.trans_dim)), pos], axis=1
        )
        rates = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        for i in range(cfg.depth):
            x = VitBlock(
                cfg.num_heads, drop_path=float(rates[i]), dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=not train, pos=pos)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        logits = nn.Dense(self.num_tokens, dtype=self.dtype, name="lm_head")(
            x[:, 1:]
        )  # [B, G, num_tokens]
        return logits


def mpm_loss(
    logits: jax.Array, target_ids: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Masked-position cross entropy + masked-position accuracy."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, target_ids[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    loss = -jnp.sum(picked * m) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == target_ids) * m) / denom
    return loss, acc
