"""Shared flax layers with CLIP/ULIP numerical-parity behaviors.

The frozen ULIP/SLIP checkpoints were trained with fp16-era CLIP tricks
whose numerics matter when loading those weights (SURVEY.md §7.3):
fp32-computed LayerNorm (reference ``models/ULIP_models.py:21-27``),
QuickGELU (``:30-32``), and timm-style DropPath (stochastic depth).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32, result cast back to the input dtype.

    Parity with the reference's fp16-safe LayerNorm subclass
    (``models/ULIP_models.py:21-27``): under bf16 compute the statistics
    and affine still happen in f32.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's sigmoid-approximated GELU (``models/ULIP_models.py:30-32``)."""
    return x * jax.nn.sigmoid(1.702 * x)


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return quick_gelu(x)


class MlpBlock(nn.Module):
    """Transformer MLP: fc1 -> act -> fc2 (PointBERT ``Mlp``,
    ``models/pointbert/point_encoder.py:14-30``). Dropout is a no-op when
    ``deterministic`` (all PPT configs train with drop=0)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable[[jax.Array], jax.Array] = nn.gelu
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample.

    Equivalent of timm's DropPath used by PointBERT blocks
    (``models/pointbert/point_encoder.py:68``).
    """

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
