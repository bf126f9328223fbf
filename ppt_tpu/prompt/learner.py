"""PromptLearner: learnable context tokens spliced into class prompts.

The reference builds each class's prompt embedding with a Python loop over
classes re-concatenating tensor slices every forward pass
(``models/ULIP_models.py:104-151``). Here the splice is precomputed once on
the host into three index tensors, and the forward pass is a single
``where(mask, learnable[ctx_idx], base_embedding)`` select — fully
vectorized, no per-class control flow, trace-size independent of the
number of classes.

Layout semantics (parity with reference ``PromptLearner``):
  - prompts are tokenized as ``[SOT] X*n_ctx <classname> . [EOT] <pad>``;
  - ``class_name_position``:
      * ``end``:    [SOT] [ctx]                [name] [. EOT pad]
      * ``front``:  [SOT] [name] [ctx]                [. EOT pad]
      * ``middle``: [SOT] [ctx:half] [name] [ctx half:] [. EOT pad]
  - the EOT pooling position equals ``argmax(token_ids)`` of the
    *unrearranged* tokenization; the rearrangement permutes only positions
    before the EOT, so the position is invariant (``ULIP_models.py:219``).
  - a non-empty ``template_init`` phrase sets the context length to its
    word count (reference behavior: the template fixes the token budget;
    the vectors themselves are still randomly initialized,
    ``ULIP_models.py:80-88,235``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ppt_tpu.prompt.tokenizer import ClipTokenizer, CONTEXT_LENGTH


@dataclasses.dataclass(frozen=True)
class PromptSpec:
    """Host-precomputed splice plan for a classname set."""

    tokens: np.ndarray  # [C, L] i32 — tokenization of the raw prompts
    perm_tokens: np.ndarray  # [C, L] i32 — token ids rearranged to output order
    ctx_mask: np.ndarray  # [C, L] bool — True where a learnable token goes
    ctx_idx: np.ndarray  # [C, L] i32 — which learnable token (0 where unused)
    eot_pos: np.ndarray  # [C] i32 — pooling positions
    n_ctx: int
    name_lengths: np.ndarray  # [C] i32 — BPE length of each classname


def build_prompt_spec(
    classnames: Sequence[str],
    n_ctx: int = 32,
    class_name_position: str = "end",
    template_init: str = "",
    tokenizer: ClipTokenizer | None = None,
    context_length: int = CONTEXT_LENGTH,
) -> PromptSpec:
    if tokenizer is None:
        tokenizer = ClipTokenizer()
    if class_name_position not in ("front", "middle", "end"):
        raise ValueError(
            f"class_name_position={class_name_position!r} not in "
            "['front', 'middle', 'end']"
        )

    if template_init:
        phrase = template_init.replace("_", " ")
        n_ctx = len(phrase.split(" "))
        prefix = phrase
    else:
        prefix = " ".join(["X"] * n_ctx)

    names = [name.replace("_", " ") for name in classnames]
    name_lengths = np.array(
        [len(tokenizer.encode(name)) for name in names], dtype=np.int32
    )
    tokens = tokenizer(
        [f"{prefix} {name}." for name in names], context_length
    )  # [C, L]

    C, L = tokens.shape
    half = n_ctx // 2
    perm_tokens = np.zeros_like(tokens)
    ctx_mask = np.zeros((C, L), dtype=bool)
    ctx_idx = np.zeros((C, L), dtype=np.int32)

    for c in range(C):
        ln = int(name_lengths[c])
        # source positions in `tokens[c]`: 0=SOT, [1,1+n_ctx)=ctx slots,
        # [1+n_ctx, 1+n_ctx+ln)=name, tail = ". EOT pad".
        name_src = list(range(1 + n_ctx, 1 + n_ctx + ln))
        tail_src = list(range(1 + n_ctx + ln, L))
        # output plan: list of ('emb', src) | ('ctx', k)
        if class_name_position == "end":
            plan = (
                [("emb", 0)]
                + [("ctx", k) for k in range(n_ctx)]
                + [("emb", s) for s in name_src + tail_src]
            )
        elif class_name_position == "front":
            plan = (
                [("emb", 0)]
                + [("emb", s) for s in name_src]
                + [("ctx", k) for k in range(n_ctx)]
                + [("emb", s) for s in tail_src]
            )
        else:  # middle
            plan = (
                [("emb", 0)]
                + [("ctx", k) for k in range(half)]
                + [("emb", s) for s in name_src]
                + [("ctx", k) for k in range(half, n_ctx)]
                + [("emb", s) for s in tail_src]
            )
        assert len(plan) == L
        for p, (kind, v) in enumerate(plan):
            if kind == "emb":
                perm_tokens[c, p] = tokens[c, v]
            else:
                ctx_mask[c, p] = True
                ctx_idx[c, p] = v

    return PromptSpec(
        tokens=tokens,
        perm_tokens=perm_tokens,
        ctx_mask=ctx_mask,
        ctx_idx=ctx_idx,
        eot_pos=np.argmax(tokens, axis=1).astype(np.int32),
        n_ctx=n_ctx,
        name_lengths=name_lengths,
    )


class PromptLearner(nn.Module):
    """Holds the learnable context vectors; splices them into the frozen
    prompt base via the precomputed spec.

    ``__call__`` takes the embedded base ``[C, L, width]`` (the caller
    embeds ``spec.perm_tokens`` through the frozen token-embedding table)
    and returns the spliced prompt embeddings, same shape.
    """

    n_ctx: int
    width: int = 512

    @nn.compact
    def __call__(
        self,
        base_embeds: jax.Array,
        ctx_mask: jax.Array,
        ctx_idx: jax.Array,
    ) -> jax.Array:
        learnable = self.param(
            "learnable_tokens",
            nn.initializers.normal(0.02),
            (self.n_ctx, self.width),
        )
        spliced = learnable.astype(base_embeds.dtype)[ctx_idx]  # [C, L, width]
        return jnp.where(ctx_mask[..., None], spliced, base_embeds)
