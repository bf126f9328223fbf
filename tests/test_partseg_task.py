"""Partseg task end-to-end smoke on synthetic data + metric unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppt_tpu.data.datasets import SHAPENETPART_PART_RANGES
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.utils.metrics import partseg_ious, refine_partseg_logits


class TestPartsegMetrics:
    def test_refinement_masks_out_of_category(self):
        # category 0 (Airplane) spans parts [0, 4); logits favoring part 10
        logits = np.full((1, 5, 50), -1.0, np.float32)
        logits[0, :, 10] = 5.0  # out-of-category part
        logits[0, :, 2] = 1.0  # in-category part
        refined = refine_partseg_logits(
            jnp.asarray(logits), jnp.asarray([0]), jnp.asarray(SHAPENETPART_PART_RANGES)
        )
        np.testing.assert_array_equal(np.asarray(refined)[0], 2)

    def test_perfect_prediction_ious(self):
        labels = np.array([[12, 12, 13, 14, 15, 12]])  # Chair parts
        ious = partseg_ious(
            jnp.asarray(labels), jnp.asarray(labels), jnp.asarray([4]),
            jnp.asarray(SHAPENETPART_PART_RANGES), 16,
        )
        assert float(ious["accuracy"]) == 100.0
        assert abs(float(ious["instance_miou"]) - 100.0) < 1e-4
        assert abs(float(ious["category_miou"]) - 100.0) < 1e-4

    def test_absent_part_counts_as_one(self):
        # Chair has 4 parts; sample only uses 12; pred matches ->
        # IoU = mean(1, 1, 1, 1) = 1 (absent parts count 1.0 per reference)
        labels = np.array([[12, 12, 12, 12]])
        ious = partseg_ious(
            jnp.asarray(labels), jnp.asarray(labels), jnp.asarray([4]),
            jnp.asarray(SHAPENETPART_PART_RANGES), 16,
        )
        assert abs(float(ious["instance_miou"]) - 100.0) < 1e-4

    def test_half_wrong(self):
        labels = np.array([[12, 12, 13, 13]])
        preds = np.array([[12, 12, 12, 12]])
        ious = partseg_ious(
            jnp.asarray(preds), jnp.asarray(labels), jnp.asarray([4]),
            jnp.asarray(SHAPENETPART_PART_RANGES), 16,
        )
        # part 12: inter 2, union 4 -> 0.5; part 13: 0/2 -> 0;
        # parts 14, 15 absent -> 1.0 each; mean = 0.625
        assert abs(float(ious["instance_miou"]) - 62.5) < 1e-3
        assert float(ious["accuracy"]) == 50.0


def test_partseg_task_end_to_end(tmp_path):
    from ppt_tpu.nn import PointBertConfig, PointBert
    from ppt_tpu.nn.pointbert import PointBertPartSeg
    from ppt_tpu.nn.text import TextConfig
    from ppt_tpu.models import ulip as ulip_mod
    from ppt_tpu.tasks import partseg

    tiny = PointBertConfig(
        trans_dim=48, depth=12, drop_path_rate=0.0, num_heads=4,
        group_size=8, num_group=16, encoder_dims=32,
    )
    orig = ulip_mod.MODEL_REGISTRY["ULIP_PointBERT_partseg"]
    ulip_mod.MODEL_REGISTRY["ULIP_PointBERT_partseg"] = lambda args: ulip_mod._make(
        "ULIP_PointBERT_partseg", PointBertPartSeg(tiny), 128, args
    )
    try:
        args = TaskArgs(
            dataset_name="synthetic",
            model="ULIP_PointBERT_partseg",
            task="partseg",
            npoints=1024,
            batch_size=4,
            epochs=1,
            warmup_epochs=0,
            num_learnable_prompt_tokens=4,
            label_smoothing=0.0,
            output_dir=str(tmp_path),
            exp_name="partseg_smoke",
            pretrained_dir="",
            eval_freq=1,
        )
        args.num_classes = 4
        args.samples_per_class = 3
        args.text_config = TextConfig(width=64, layers=2, heads=4, embed_dim=64)
        result = partseg.main(args)
    finally:
        ulip_mod.MODEL_REGISTRY["ULIP_PointBERT_partseg"] = orig

    assert result["best_epoch"] >= 0
    best = result["best"]
    assert np.isfinite(best["instance_miou"])
    assert np.isfinite(best["category_miou"])
    assert 0 <= best["accuracy"] <= 100
