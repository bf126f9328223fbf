"""Metrics: top-k / per-class accuracy, partseg mIoU, running meters.

Reference definitions: top-k accuracy ``utils/utils.py:376-398``,
per-class accuracy dump ``main_cls.py:270-299``, ShapeNetPart
instance/category mIoU with category-masked refinement
``main_partseg.py:219-225,317-367``.

The partseg IoU computation — a per-sample Python loop over parts in the
reference — is vectorized here as masked reductions so it can run jitted
on device over the whole eval set.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_accuracy(
    logits: jax.Array, labels: jax.Array, topk: Sequence[int] = (1,)
) -> Tuple[jax.Array, ...]:
    """Top-k accuracies in percent (``utils/utils.py:376-398``)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # [B, maxk]
    correct = pred == labels[:, None]
    return tuple(
        100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1)) for k in topk
    )


def per_class_accuracy(
    preds: np.ndarray, labels: np.ndarray, num_classes: int
) -> np.ndarray:
    """[num_classes] accuracy per class; NaN for absent classes."""
    out = np.full(num_classes, np.nan)
    for c in range(num_classes):
        m = labels == c
        if m.any():
            out[c] = 100.0 * np.mean(preds[m] == labels[m])
    return out


def refine_partseg_logits(
    logits: jax.Array,
    category: jax.Array,
    part_ranges: jax.Array,
) -> jax.Array:
    """Category-constrained argmax refinement.

    Masks each sample's part logits to its ground-truth object category's
    part-label range before the argmax (``main_partseg.py:219-225``).

    Args:
      logits: [B, N, P] part logits.
      category: [B] int object category.
      part_ranges: [K, 2] (start, end) part-label span per category.
    Returns:
      [B, N] refined part predictions.
    """
    P = logits.shape[-1]
    part_ids = jnp.arange(P)
    lo = part_ranges[category, 0][:, None]  # [B,1]
    hi = part_ranges[category, 1][:, None]
    valid = (part_ids[None, :] >= lo) & (part_ids[None, :] < hi)  # [B,P]
    masked = jnp.where(valid[:, None, :], logits, -jnp.inf)
    return jnp.argmax(masked, axis=-1)


def partseg_ious(
    preds: jax.Array,
    labels: jax.Array,
    category: jax.Array,
    part_ranges: jax.Array,
    num_categories: int,
) -> Dict[str, jax.Array]:
    """Instance and category mIoU, fully vectorized.

    Per reference semantics (``main_partseg.py:317-344``): per-sample IoU
    per part within the sample's category range, with IoU := 1 when a part
    has neither predictions nor ground-truth points; the sample IoU is the
    mean over its category's parts; instance mIoU averages over samples,
    category mIoU averages per-category means.
    """
    B, N = labels.shape
    P = int(part_ranges[:, 1].max())  # static upper bound on part count

    part_ids = jnp.arange(P)
    lo = part_ranges[category, 0][:, None]
    hi = part_ranges[category, 1][:, None]
    in_range = (part_ids[None, :] >= lo) & (part_ids[None, :] < hi)  # [B,P]

    pred_oh = preds[:, :, None] == part_ids[None, None, :]  # [B,N,P]
    gt_oh = labels[:, :, None] == part_ids[None, None, :]
    inter = jnp.sum(pred_oh & gt_oh, axis=1)  # [B,P]
    union = jnp.sum(pred_oh | gt_oh, axis=1)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)  # [B,P]

    n_parts = jnp.sum(in_range, axis=1)  # [B]
    sample_iou = jnp.sum(jnp.where(in_range, iou, 0.0), axis=1) / n_parts

    cat_oh = jax.nn.one_hot(category, num_categories)  # [B,K]
    cat_counts = jnp.sum(cat_oh, axis=0)  # [K]
    cat_sums = cat_oh.T @ sample_iou  # [K]
    cat_means = jnp.where(cat_counts > 0, cat_sums / jnp.maximum(cat_counts, 1), jnp.nan)

    acc = jnp.mean(preds == labels)
    return {
        "accuracy": 100.0 * acc,
        "instance_miou": 100.0 * jnp.mean(sample_iou),
        "category_miou": 100.0 * jnp.nanmean(cat_means),
        "category_ious": 100.0 * cat_means,
    }


class ConfusionMatrix:
    """Accumulating confusion matrix with the openpoints metric surface
    (``openpoints/utils/metrics.py:51-177``): overall accuracy, mean
    (macro) class accuracy, per-class IoU and mIoU."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.matrix = np.zeros((num_classes, num_classes), dtype=np.int64)

    def update(self, preds: np.ndarray, labels: np.ndarray):
        preds = np.asarray(preds).reshape(-1)
        labels = np.asarray(labels).reshape(-1)
        idx = labels * self.num_classes + preds
        self.matrix += np.bincount(
            idx, minlength=self.num_classes**2
        ).reshape(self.num_classes, self.num_classes)

    @property
    def overall_accuracy(self) -> float:
        total = self.matrix.sum()
        return 100.0 * np.trace(self.matrix) / max(total, 1)

    @property
    def class_accuracy(self) -> np.ndarray:
        support = self.matrix.sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            acc = np.diag(self.matrix) / support
        return 100.0 * acc

    @property
    def mean_accuracy(self) -> float:
        acc = self.class_accuracy
        return float(np.nanmean(acc))

    @property
    def ious(self) -> np.ndarray:
        inter = np.diag(self.matrix).astype(np.float64)
        union = (
            self.matrix.sum(axis=0) + self.matrix.sum(axis=1) - np.diag(self.matrix)
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            iou = inter / union
        return 100.0 * iou

    @property
    def miou(self) -> float:
        return float(np.nanmean(self.ious))


class Meter:
    """Host-side running average (the reference's ``AverageMeter``,
    ``utils/utils.py:320-352``, minus the manual dist.all_reduce — metric
    values arriving here are already globally reduced by the jitted
    step)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __repr__(self):
        return f"{self.name}: {self.avg:.4f} (n={self.count})"
