"""CLIP text tower, flax.linen, checkpoint-compatible with SLIP weights.

Architecture (reference ``models/ULIP_models.py:154-230``): vocab-49408
token embedding, learned positional embedding over 77 positions, 12
pre-norm residual blocks (width 512, 8 heads, QuickGELU MLP, fused-QKV
attention, causal mask), fp32 final LayerNorm, EOT-token pooling, and a
learned ``text_projection`` to the joint embedding space.

TPU notes: the whole prompt batch ``[num_classes, 77, 512]`` is one
forward — all matmuls are MXU-shaped; the causal mask is a compile-time
constant; attention uses ``jax.nn.dot_product_attention`` so XLA can pick
its fused path. Params stay f32 (frozen CLIP weights); activations can run
bf16 via ``dtype``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu.nn.layers import LayerNormF32, quick_gelu


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512  # joint space


class FusedQKVAttention(nn.Module):
    """Multi-head self-attention with a fused QKV projection.

    Mirrors torch ``nn.MultiheadAttention``'s parameter layout
    (``in_proj`` = concatenated q/k/v, plus ``out_proj``) so SLIP text
    checkpoints convert one-to-one.
    """

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        B, L, D = x.shape
        head_dim = D // self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(B, L, self.heads, head_dim)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        bias = None
        if mask is not None:
            bias = mask[None, None, :, :].astype(jnp.float32)
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class TextBlock(nn.Module):
    """Pre-norm residual attention block (``ResidualAttentionBlock``,
    reference ``models/ULIP_models.py:35-56``)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        import os

        D = x.shape[-1]
        # Whole-block fused Pallas kernel (kernels/textblock.py): LN1,
        # fused-QKV, causal attention, out_proj, residual, LN2,
        # QuickGELU MLP, residual — one VMEM pass per class. The kernel
        # bakes in the standard causal mask (ULIP_models.py:224-230),
        # so it only engages on the masked path; D must be lane-aligned.
        # DEFAULT OFF — measured SLOWER on-chip than this XLA path
        # (which already runs ~60% MFU on [C*77, D]-tall matmuls); the
        # kernel docstring records the numbers. PPT_FUSED_TEXT=1
        # enables for re-measurement; PPT_FORCE_XLA_ATTN=1 disables.
        use_fused = (
            not self.is_initializing()
            and mask is not None
            and D % 128 == 0
            and not os.environ.get("PPT_FORCE_XLA_ATTN")
            and os.environ.get("PPT_FUSED_TEXT", "0") == "1"
        )
        if use_fused:
            from ppt_tpu.kernels.textblock import fused_text_block

            p = self.variables["params"]
            dt = self.dtype
            return fused_text_block(
                x,
                p["ln_1"]["norm"]["scale"], p["ln_1"]["norm"]["bias"],
                p["attn"]["in_proj"]["kernel"].astype(dt),
                p["attn"]["in_proj"]["bias"],
                p["attn"]["out_proj"]["kernel"].astype(dt),
                p["attn"]["out_proj"]["bias"],
                p["ln_2"]["norm"]["scale"], p["ln_2"]["norm"]["bias"],
                p["c_fc"]["kernel"].astype(dt), p["c_fc"]["bias"],
                p["c_proj"]["kernel"].astype(dt), p["c_proj"]["bias"],
                self.heads,
            )
        y = LayerNormF32(name="ln_1")(x)
        x = x + FusedQKVAttention(self.heads, dtype=self.dtype, name="attn")(y, mask)
        y = LayerNormF32(name="ln_2")(x)
        h = nn.Dense(4 * D, dtype=self.dtype, name="c_fc")(y)
        h = quick_gelu(h)
        h = nn.Dense(D, dtype=self.dtype, name="c_proj")(h)
        return x + h


def causal_mask(length: int) -> np.ndarray:
    """Additive causal mask, -inf above the diagonal
    (reference ``models/ULIP_models.py:224-230``)."""
    mask = np.zeros((length, length), dtype=np.float32)
    mask[np.triu_indices(length, k=1)] = -np.inf
    return mask


class TextTransformer(nn.Module):
    """CLIP text encoder operating on pre-built prompt embeddings.

    Two entry points:
      - ``embed(tokens)``: token ids -> embeddings (used by the
        PromptLearner to build its frozen base once);
      - ``__call__(prompt_embeds, eot_positions)``: full transformer over
        ``[C, 77, width]`` embeddings, pools at the EOT position, projects
        to the joint space. EOT positions come from argmax over token ids
        (EOT has the highest id), reference ``models/ULIP_models.py:219``.
    """

    config: TextConfig = TextConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.token_embedding = nn.Embed(
            cfg.vocab_size,
            cfg.width,
            embedding_init=nn.initializers.normal(0.02),
            name="token_embedding",
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        self.blocks = [
            TextBlock(cfg.heads, dtype=self.dtype, name=f"block_{i}")
            for i in range(cfg.layers)
        ]
        self.ln_final = LayerNormF32(name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(cfg.width**-0.5),
            (cfg.width, cfg.embed_dim),
        )
        self._mask = causal_mask(cfg.context_length)

    def embed(self, tokens: jax.Array) -> jax.Array:
        return self.token_embedding(tokens)

    def __call__(
        self, prompt_embeds: jax.Array, eot_positions: jax.Array
    ) -> jax.Array:
        """prompt_embeds: [C, L, width]; eot_positions: [C] int.
        Returns [C, embed_dim] (unnormalized).

        ``L`` may be SHORTER than ``config.context_length``: the causal
        mask + EOT pooling make trailing pad positions dead work (see
        ``PromptArrays.from_spec``), so callers may pass truncated
        prompts; the positional embedding and mask are sliced to match.
        """
        import os

        L = prompt_embeds.shape[1]
        if L > self.config.context_length:
            raise ValueError(
                f"prompt length {L} exceeds context_length "
                f"{self.config.context_length}"
            )
        x = prompt_embeds.astype(self.dtype) + self.positional_embedding[
            :L
        ].astype(self.dtype)

        # Whole-TOWER fused Pallas kernel (kernels/texttower.py): all 12
        # blocks + EOT pooling + ln_final + projection in one call,
        # gridded over 8-class chunks, with a fully hand-written
        # input-cotangent backward kernel. On-chip EXACT (kernel_check
        # row, grads ≤1e-4 vs autodiff at f32) but measured BREAK-EVEN
        # with the XLA tower at the flagship shape (fwd 1.23 vs 1.20 ms,
        # fwd+bwd 2.887 vs 2.887 — docs/PROFILE_r04.md: the r3 profile's
        # "6.2 ms text" attribution was inflated ~2x by step_profile's
        # session variance; the XLA chain was never the bottleneck
        # claimed). DEFAULT OFF — identical speed, extra compile time;
        # PPT_FUSED_TEXT_TOWER=1 enables for re-measurement.
        cfg = self.config
        use_tower = (
            not self.is_initializing()
            and cfg.width % 128 == 0
            and cfg.embed_dim % 128 == 0
            and not os.environ.get("PPT_FORCE_XLA_ATTN")
            and os.environ.get("PPT_FUSED_TEXT_TOWER", "0") == "1"
        )
        if use_tower:
            from ppt_tpu.kernels.texttower import fused_text_tower

            p = self.variables["params"]
            dt = self.dtype

            def stk(*path, cast=None):
                arrs = [p[f"block_{i}"] for i in range(cfg.layers)]
                for key in path:
                    arrs = [a[key] for a in arrs]
                out = jnp.stack(arrs)
                return out.astype(cast) if cast is not None else out

            eot_onehot = (
                jnp.arange(L)[None, :] == eot_positions[:, None]
            ).astype(jnp.float32)
            out = fused_text_tower(
                x, eot_onehot,
                stk("ln_1", "norm", "scale"), stk("ln_1", "norm", "bias"),
                stk("attn", "in_proj", "kernel", cast=dt),
                stk("attn", "in_proj", "bias"),
                stk("attn", "out_proj", "kernel", cast=dt),
                stk("attn", "out_proj", "bias"),
                stk("ln_2", "norm", "scale"), stk("ln_2", "norm", "bias"),
                stk("c_fc", "kernel", cast=dt), stk("c_fc", "bias"),
                stk("c_proj", "kernel", cast=dt), stk("c_proj", "bias"),
                p["ln_final"]["norm"]["scale"],
                p["ln_final"]["norm"]["bias"],
                self.text_projection,
                cfg.heads,
            )
            return out.astype(self.dtype)

        mask = jnp.asarray(self._mask[:L, :L])
        for block in self.blocks:
            x = block(x, mask)
        x = self.ln_final(x)
        pooled = jnp.take_along_axis(
            x, eot_positions[:, None, None], axis=1
        )[:, 0, :]
        return (pooled.astype(jnp.float32) @ self.text_projection).astype(
            self.dtype
        )
