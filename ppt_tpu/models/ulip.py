"""The ULIP composite model: point encoder + prompt-tuned CLIP text tower.

Reference: ``ULIP_WITH_IMAGE`` (``models/ULIP_models.py:154-283``) and the
factory set ``ULIP_PN_SSG/..._MSG/..._MLP/ULIP_PointBERT(_partseg)/
..._NEXT/ULIP_CUSTOMIZED`` (``:294-658``).

Forward contract (classification):
    pc_embed  = point_encoder(pc) @ pc_projection             # [B, E]
    prompts   = PromptLearner splice over the frozen token embeddings
    text_embed= normalize(text_tower(prompts)[eot] @ text_proj)  # [C, E]
    logits    = exp(logit_scale) * pc_embed @ text_embed.T    # [B, C]

Parity quirks preserved: ``text_embed`` is L2-normalized but ``pc_embed``
is NOT (``ULIP_models.py:276-281``); ``logit_scale`` is a learned scalar
initialized to ``log(1/0.07)`` and clamped to ``<= ln(100)`` by the
training loop (``main_cls.py:213``).

The freeze story is a parameter *partition*, not stop-gradients: the
trainable subset (prompt tokens, optional PointAdapter leaves, partseg
head) is selected by :func:`trainable_mask` and only those leaves receive
optimizer updates; gradients still flow *through* the frozen towers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import chex
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import traverse_util

from ppt_tpu.nn import (
    PointBert,
    PointBertConfig,
    PointBertPartSeg,
    PointMLP,
    PointNet2Msg,
    PointNet2Ssg,
    PointNext,
    TextConfig,
    TextTransformer,
)
from ppt_tpu.prompt import PromptLearner, PromptSpec


@chex.dataclass(frozen=True)
class PromptArrays:
    """Device-side view of a PromptSpec — passed to the model per call."""

    perm_tokens: jax.Array  # [C, L] i32
    ctx_mask: jax.Array  # [C, L] bool
    ctx_idx: jax.Array  # [C, L] i32
    eot_pos: jax.Array  # [C] i32

    @classmethod
    def from_spec(
        cls, spec: PromptSpec, truncate: bool = True
    ) -> "PromptArrays":
        """Build device arrays; by default TRUNCATE the context dim.

        The CLIP text tower is causal (``ULIP_models.py:224-230``) and
        pools at the EOT position (``:219``): positions past every
        class's EOT are attended by nothing that reaches the pooled
        output, so dropping them is mathematically exact — each padded
        key contributes exp(-inf)=0 to every valid row's softmax and
        0*v to its PV sum. The reference runs all 77 positions anyway;
        here the splice tables are sliced to ``max(eot)+1`` rounded up
        to 16 (sublane tile), cutting text fwd+bwd work ~40% at the
        flagship prompt length (38 of 77 used). ``truncate=False`` (or
        ``PPT_TEXT_TRUNCATE=0``) restores the full 77-position context.
        """
        import os

        L = spec.perm_tokens.shape[1]
        if truncate and os.environ.get("PPT_TEXT_TRUNCATE", "1") != "0":
            used = int(spec.eot_pos.max()) + 1
            L = min(L, ((used + 15) // 16) * 16)
        return cls(
            perm_tokens=jnp.asarray(spec.perm_tokens[:, :L]),
            ctx_mask=jnp.asarray(spec.ctx_mask[:, :L]),
            ctx_idx=jnp.asarray(spec.ctx_idx[:, :L]),
            eot_pos=jnp.asarray(spec.eot_pos),
        )


class Ulip(nn.Module):
    """Composite prompt-tuned multimodal model."""

    point_encoder: nn.Module
    pc_feat_dims: int
    n_ctx: int = 32
    task: str = "cls"  # 'cls' | 'partseg'
    text_config: TextConfig = TextConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.text_config
        self.text = TextTransformer(cfg, dtype=self.dtype, name="text")
        self.prompt_learner = PromptLearner(
            n_ctx=self.n_ctx, width=cfg.width, name="prompt_learner"
        )
        self.pc_projection = self.param(
            "pc_projection",
            nn.initializers.normal(512**-0.5),
            (self.pc_feat_dims, cfg.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(np.log(1.0 / 0.07), dtype=jnp.float32),
        )

    def encode_text(self, prompts: PromptArrays) -> jax.Array:
        """All-class text embeddings, L2-normalized. [C, E]."""
        base = self.text.embed(prompts.perm_tokens)
        spliced = self.prompt_learner(base, prompts.ctx_mask, prompts.ctx_idx)
        emb = self.text(spliced, prompts.eot_pos)
        emb = emb.astype(jnp.float32)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_captions(self, tokens: jax.Array) -> jax.Array:
        """Raw caption tokens -> normalized text embeddings [B, E].

        The ULIP pretraining path (no prompt learner): embeds tokenized
        captions and pools at the EOT position, mirroring the original
        ULIP ``encode_text`` over template captions.
        """
        base = self.text.embed(tokens)
        emb = self.text(base, jnp.argmax(tokens, axis=-1))
        emb = emb.astype(jnp.float32)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_pc(
        self,
        pc: jax.Array,
        cls_onehot: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """Point embedding(s): [B, E] for cls, [B, N, E] for partseg.
        Deliberately NOT normalized (parity, ULIP_models.py:277)."""
        if self.task == "partseg":
            feat = self.point_encoder(pc, cls_onehot, train=train)
        else:
            feat = self.point_encoder(pc, train=train)
        return feat.astype(jnp.float32) @ self.pc_projection

    def __call__(
        self,
        pc: jax.Array,
        prompts: PromptArrays,
        cls_onehot: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        pc_embed = self.encode_pc(pc, cls_onehot, train=train)
        text_embed = self.encode_text(prompts)
        scale = jnp.exp(self.logit_scale)
        return scale * pc_embed @ text_embed.T


# ---------------------------------------------------------------------------
# Factories (parity with models/ULIP_models.py:294-658)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ModelSpec:
    model: Ulip
    pc_feat_dims: int
    name: str


def _resolve_dtype(value) -> jnp.dtype:
    if isinstance(value, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[value]
    return value


def _make(
    name: str, encoder: nn.Module, pc_feat_dims: int, args,
    *, thread_dtype: bool = True,
) -> ModelSpec:
    dt = _resolve_dtype(getattr(args, "compute_dtype", jnp.float32))
    # Thread the compute dtype into the point tower too: Ulip's dtype
    # only governs the text tower; the encoder submodule keeps its own
    # construction-time dtype (f32 default), so without this clone a
    # bf16 run would silently leave the whole point tower in f32.
    # ``thread_dtype=False`` (ulip_customized) leaves a caller-supplied
    # encoder's explicit dtype authoritative instead of overriding it.
    if thread_dtype and hasattr(encoder, "dtype") and encoder.dtype != dt:
        encoder = encoder.clone(dtype=dt)
    model = Ulip(
        point_encoder=encoder,
        pc_feat_dims=pc_feat_dims,
        n_ctx=getattr(args, "num_learnable_prompt_tokens", 32),
        task=getattr(args, "task", "cls"),
        text_config=getattr(args, "text_config", None) or TextConfig(),
        dtype=dt,
    )
    return ModelSpec(model=model, pc_feat_dims=pc_feat_dims, name=name)


def ulip_pn_ssg(args) -> ModelSpec:
    return _make("ULIP_PN_SSG", PointNet2Ssg(), 256, args)


def ulip_pn_msg(args) -> ModelSpec:
    return _make("ULIP_PN_MSG", PointNet2Msg(), 256, args)


def ulip_pn_mlp(args) -> ModelSpec:
    return _make("ULIP_PN_MLP", PointMLP(), 256, args)


def ulip_pointbert(args) -> ModelSpec:
    cfg = PointBertConfig()
    return _make("ULIP_PointBERT", PointBert(cfg), 768, args)


def ulip_pointbert_partseg(args) -> ModelSpec:
    cfg = PointBertConfig()
    return _make(
        "ULIP_PointBERT_partseg", PointBertPartSeg(cfg), 128, args
    )


def ulip_pn_next(args) -> ModelSpec:
    return _make("ULIP_PN_NEXT", PointNext(), 256, args)


def ulip_customized(args, encoder: nn.Module, pc_feat_dims: int = 512) -> ModelSpec:
    """Template factory for user-provided 3D backbones
    (``ULIP_CUSTOMIZED``, ULIP_models.py:621-658). The caller's encoder
    dtype is respected as-is — construct the encoder with the desired
    compute dtype (``args.compute_dtype`` governs only the text tower
    here)."""
    return _make(
        "ULIP_CUSTOMIZED", encoder, pc_feat_dims, args, thread_dtype=False
    )


def ulip_pointnet(args) -> ModelSpec:
    from ppt_tpu.nn import PointNetClassic

    return _make("ULIP_PointNet", PointNetClassic(), 256, args)


def ulip_pointnet_stn(args) -> ModelSpec:
    from ppt_tpu.nn import PointNetEncoder

    return _make("ULIP_PointNet_STN", PointNetEncoder(), 1024, args)


def ulip_dgcnn(args) -> ModelSpec:
    from ppt_tpu.nn import DgcnnClassifier

    return _make("ULIP_DGCNN", DgcnnClassifier(), 256, args)


def ulip_pct(args) -> ModelSpec:
    from ppt_tpu.nn import Pct

    return _make("ULIP_PCT", Pct(), 256, args)


def ulip_curvenet(args) -> ModelSpec:
    from ppt_tpu.nn import CurveNet

    return _make("ULIP_CurveNet", CurveNet(), 256, args)


MODEL_REGISTRY: Dict[str, Callable[..., ModelSpec]] = {
    "ULIP_PN_SSG": ulip_pn_ssg,
    "ULIP_PN_MSG": ulip_pn_msg,
    "ULIP_PN_MLP": ulip_pn_mlp,
    "ULIP_PointBERT": ulip_pointbert,
    "ULIP_PointBERT_partseg": ulip_pointbert_partseg,
    "ULIP_PN_NEXT": ulip_pn_next,
    "ULIP_PointNet": ulip_pointnet,
    "ULIP_PointNet_STN": ulip_pointnet_stn,
    "ULIP_DGCNN": ulip_dgcnn,
    "ULIP_PCT": ulip_pct,
    "ULIP_CurveNet": ulip_curvenet,
}


def build_model(name: str, args) -> ModelSpec:
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](args)


# ---------------------------------------------------------------------------
# Freeze partition
# ---------------------------------------------------------------------------

# PointAdapter: the progressively unfrozen tensors of the last PointBERT
# block (reference unfreeze lists, ULIP_models.py:461-470), mapped to this
# framework's parameter paths.
_HEAD_TYPE_UNFREEZE = {
    1: [
        ("point_encoder", "block_11", "norm2"),
        ("point_encoder", "block_11", "mlp", "fc2"),
    ],
    2: [
        ("point_encoder", "block_11", "norm1"),
        ("point_encoder", "block_11", "mlp", "fc1"),
    ],
    3: [
        ("point_encoder", "block_11", "attn", "qkv"),
        ("point_encoder", "block_11", "attn", "proj"),
    ],
}

# partseg: everything in the point encoder that is NOT part of the
# pretrained PointBERT trunk trains (reference keeps params absent from
# the ckpt trainable, ULIP_models.py:550-566).
_PARTSEG_TRAINABLE_SUBTREES = (
    "propagation_0",
    "propagation_1",
    "propagation_2",
    "dgcnn_pro_1",
    "dgcnn_pro_2",
    "conv1",
    "bn1",
)


def trainable_mask(
    params: Any, head_type: int = 0, task: str = "cls"
) -> Any:
    """Boolean pytree marking which parameter leaves train.

    Prompt tasks: always ``prompt_learner/*``; head_type>0 progressively
    adds the PointAdapter leaves; partseg adds the non-pretrained
    segmentation-head subtrees. ``task='pretrain'`` instead trains the
    point encoder + pc_projection + logit_scale against the frozen text
    tower (the original ULIP recipe).
    """
    flat = traverse_util.flatten_dict(params)

    def is_trainable(path) -> bool:
        if task == "pretrain":
            return path[0] in ("point_encoder", "pc_projection", "logit_scale")
        if "prompt_learner" in path:
            return True
        for ht, prefixes in _HEAD_TYPE_UNFREEZE.items():
            if head_type >= ht:
                for prefix in prefixes:
                    if path[: len(prefix)] == prefix:
                        return True
        if task == "partseg" and path and path[0] == "point_encoder":
            if len(path) > 1 and path[1] in _PARTSEG_TRAINABLE_SUBTREES:
                return True
        return False

    return traverse_util.unflatten_dict(
        {path: is_trainable(path) for path in flat}
    )
