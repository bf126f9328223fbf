"""Pretraining task: contrastive loss behavior + end-to-end smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppt_tpu.models import ulip_contrastive_loss
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.tasks.pretrain import build_caption_bank


class TestContrastiveLoss:
    def test_perfect_alignment_low_loss(self, rng):
        emb = rng.randn(8, 16).astype(np.float32)
        out = ulip_contrastive_loss(
            jnp.asarray(emb), jnp.asarray(emb), None, jnp.asarray(100.0)
        )
        assert float(out["loss"]) < 0.01
        assert float(out["pc_text_acc"]) == 100.0

    def test_image_leg_optional(self, rng):
        pc = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        tx = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        im = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        no_img = ulip_contrastive_loss(pc, tx, None, jnp.asarray(1.0))
        with_img = ulip_contrastive_loss(pc, tx, im, jnp.asarray(1.0))
        assert "pc_image_acc" in with_img and "pc_image_acc" not in no_img
        assert float(with_img["loss"]) > float(no_img["loss"]) * 0.5


def test_caption_bank_shapes():
    bank = build_caption_bank(["airplane", "chair"], "shapenet_64")
    assert bank.shape == (2, 64, 77)
    assert bank.dtype == np.int32
    # every caption starts with SOT (49406)
    assert (bank[:, :, 0] == 49406).all()
    # captions differ across templates
    assert not np.array_equal(bank[0, 0], bank[0, 1])


def test_pretrain_end_to_end(tmp_path):
    from ppt_tpu.nn import PointBert, PointBertConfig
    from ppt_tpu.nn.text import TextConfig
    from ppt_tpu.models import ulip as ulip_mod
    from ppt_tpu.tasks import pretrain

    tiny = PointBertConfig(
        trans_dim=48, depth=2, drop_path_rate=0.0, num_heads=4,
        group_size=8, num_group=16, encoder_dims=32,
    )
    orig = ulip_mod.MODEL_REGISTRY["ULIP_PointBERT"]
    ulip_mod.MODEL_REGISTRY["ULIP_PointBERT"] = lambda args: ulip_mod._make(
        "ULIP_PointBERT", PointBert(tiny), 96, args
    )
    try:
        args = TaskArgs(
            dataset_name="synthetic",
            model="ULIP_PointBERT",
            npoints=128,
            batch_size=8,
            epochs=2,
            warmup_epochs=0,
            output_dir=str(tmp_path),
            exp_name="pretrain_smoke",
            pretrained_dir="",
        )
        args.num_classes = 4
        args.samples_per_class = 4
        args.text_config = TextConfig(width=64, layers=2, heads=4, embed_dim=64)
        result = pretrain.main(args)
    finally:
        ulip_mod.MODEL_REGISTRY["ULIP_PointBERT"] = orig

    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    # contrastive loss should move
    assert hist[-1]["loss"] != hist[0]["loss"]
