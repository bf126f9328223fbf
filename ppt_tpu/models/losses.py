"""Losses: label-smoothed CE (task drivers) and the ULIP pretraining
contrastive loss.

Reference: drivers use ``nn.CrossEntropyLoss(label_smoothing=...)``
(``main_cls.py:195``); the ULIP pretraining loss is a symmetric InfoNCE
over pc/text/image embedding pairs (``models/losses.py:14-90``).

Distributed note: under pjit over a data mesh the batch matmuls below are
already global — XLA inserts the all-gathers the reference does by hand
with its differentiable ``GatherLayer`` (``utils/utils.py:212-250``), and
``all_gather`` has a defined transpose in JAX, so no custom autograd
plumbing is needed.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def smoothed_cross_entropy(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.0
) -> jax.Array:
    """Mean label-smoothed cross entropy.

    Matches torch's ``CrossEntropyLoss(label_smoothing=s)``: target is
    ``(1-s)`` on the true class plus ``s/K`` uniform.
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    target = onehot * (1.0 - smoothing) + smoothing / num_classes
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def pointbert_smoothed_ce(
    logits: jax.Array, labels: jax.Array, eps: float = 0.2
) -> jax.Array:
    """PointBERT's own smoothing variant (``point_encoder.py:185-199``):
    off-classes get ``eps/(K-1)``, true class ``1-eps``."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    target = onehot * (1.0 - eps) + (1.0 - onehot) * eps / (num_classes - 1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def soft_target_cross_entropy(
    logits: jax.Array, target_probs: jax.Array
) -> jax.Array:
    """CE against a soft target distribution (openpoints SoftTarget CE,
    ``openpoints/loss/cross_entropy.py``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target_probs.astype(jnp.float32) * logp, axis=-1))


def distillation_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.5,
    temperature: float = 4.0,
) -> jax.Array:
    """Hinton KD: alpha * T^2 * KL(teacher_T || student_T) +
    (1-alpha) * CE(student, labels) (openpoints DistillCls criterion)."""
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kd = -jnp.mean(jnp.sum(p * s, axis=-1)) - (
        -jnp.mean(jnp.sum(p * jnp.log(p + 1e-10), axis=-1))
    )
    ce = smoothed_cross_entropy(student_logits, labels)
    return alpha * t * t * kd + (1.0 - alpha) * ce


def _l2_normalize(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def ulip_contrastive_loss(
    pc_embed: jax.Array,
    text_embed: jax.Array,
    image_embed: Optional[jax.Array],
    logit_scale: jax.Array,
) -> Dict[str, jax.Array]:
    """Symmetric InfoNCE across (pc, text) and optionally (pc, image).

    All embeddings ``[B, E]``; positives on the diagonal. Returns loss and
    retrieval accuracies, mirroring ``ULIPWithImageLoss.forward``.
    """
    B = pc_embed.shape[0]
    labels = jnp.arange(B)
    pc = _l2_normalize(pc_embed.astype(jnp.float32))
    tx = _l2_normalize(text_embed.astype(jnp.float32))

    def _pair_loss(a, b):
        logits_ab = logit_scale * a @ b.T
        logits_ba = logit_scale * b @ a.T
        ce = smoothed_cross_entropy
        return (ce(logits_ab, labels) + ce(logits_ba, labels)) / 2.0, logits_ab

    loss_pt, logits_pt = _pair_loss(pc, tx)
    out = {
        "pc_text_acc": 100.0
        * jnp.mean(jnp.argmax(logits_pt, axis=-1) == labels),
    }
    loss = loss_pt
    if image_embed is not None:
        im = _l2_normalize(image_embed.astype(jnp.float32))
        loss_pi, logits_pi = _pair_loss(pc, im)
        loss = loss_pt + loss_pi
        out["pc_image_acc"] = 100.0 * jnp.mean(
            jnp.argmax(logits_pi, axis=-1) == labels
        )
    out["loss"] = loss
    return out
