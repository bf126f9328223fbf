"""Prompt interpretability: nearest vocabulary words to learned contexts.

Equivalent of ``interpret_prompt.py:9-43``: load trained prompt vectors,
compute Euclidean distances to the 49408-row token-embedding table, and
decode the top-k nearest BPE tokens per context position. The distance
matrix is one [n_ctx, vocab] matmul on device.
"""

from __future__ import annotations

import logging
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ppt_tpu.prompt import ClipTokenizer

log = logging.getLogger(__name__)


def nearest_words(
    learnable_tokens: np.ndarray,
    token_embedding: np.ndarray,
    topk: int = 5,
    tokenizer: ClipTokenizer | None = None,
) -> List[List[Tuple[str, float]]]:
    """Per context vector: top-k (word, distance) pairs."""
    if tokenizer is None:
        tokenizer = ClipTokenizer()
    ctx = jnp.asarray(learnable_tokens, jnp.float32)  # [n_ctx, D]
    table = jnp.asarray(token_embedding, jnp.float32)  # [V, D]
    # ||c - t||^2 = |c|^2 + |t|^2 - 2 c.t  (one MXU matmul)
    d2 = (
        jnp.sum(ctx**2, -1)[:, None]
        + jnp.sum(table**2, -1)[None, :]
        - 2.0 * ctx @ table.T
    )
    neg, idx = jax.lax.top_k(-d2, topk)
    dists = np.sqrt(np.maximum(np.asarray(-neg), 0.0))
    idx = np.asarray(idx)
    out = []
    for i in range(idx.shape[0]):
        row = []
        for j in range(topk):
            word = tokenizer.decoder.get(int(idx[i, j]), "<unk>")
            row.append((word.replace("</w>", ""), float(dists[i, j])))
        out.append(row)
    return out


def main(args):
    """Load a checkpoint's prompt vectors + the (frozen) token embedding
    and print the nearest words (reference prints per-position top-k)."""
    logging.basicConfig(level=logging.INFO)
    from ppt_tpu.train.checkpoint import load_params_file

    ckpt = load_params_file(args.fpath)
    learnable = ckpt["trainable"]["prompt_learner"]["learnable_tokens"]

    # token embedding from the converted SLIP checkpoint
    slip_path = os.path.join(args.pretrained_dir, "slip_text.msgpack")
    slip = load_params_file(slip_path)
    table = slip["params"]["text"]["token_embedding"]["embedding"]

    results = nearest_words(learnable, table, topk=args.topk)
    for i, row in enumerate(results):
        words = ", ".join(f"{w!r}({d:.3f})" for w, d in row)
        print(f"ctx[{i:2d}]: {words}")
    return results


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
