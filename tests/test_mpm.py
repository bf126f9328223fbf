"""Masked point modeling: mask sampling, loss, and end-to-end pretraining."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppt_tpu.nn.mpm import mpm_loss, sample_group_mask


class TestMaskAndLoss:
    def test_mask_ratio(self):
        mask = np.asarray(sample_group_mask(jax.random.PRNGKey(0), 4, 64, 0.4))
        counts = mask.sum(axis=1)
        # ~25 of 64 masked (k = floor(64*0.4) = 25)
        np.testing.assert_array_equal(counts, 25)

    def test_loss_only_counts_masked(self, rng):
        logits = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
        targets = jnp.asarray(rng.randint(0, 16, (2, 8)))
        mask_none = jnp.zeros((2, 8), bool).at[:, 0].set(True)
        # perfect logits at unmasked positions must not affect the loss
        perfect = jax.nn.one_hot(targets, 16) * 100.0
        mixed = jnp.where(mask_none[..., None], logits, perfect)
        l1, _ = mpm_loss(mixed, targets, mask_none)
        l2, _ = mpm_loss(logits, targets, mask_none)
        assert abs(float(l1) - float(l2)) < 1e-4

    def test_perfect_prediction(self, rng):
        targets = jnp.asarray(rng.randint(0, 16, (2, 8)))
        logits = jax.nn.one_hot(targets, 16) * 100.0
        mask = jnp.ones((2, 8), bool)
        loss, acc = mpm_loss(logits, targets, mask)
        assert float(loss) < 1e-4
        assert float(acc) == 1.0


def test_mpm_pretrain_end_to_end(tmp_path):
    from ppt_tpu.nn.dvae import DvaeConfig
    from ppt_tpu.nn.pointbert import PointBertConfig
    from ppt_tpu.tasks import mpm_pretrain
    from ppt_tpu.tasks.args import TaskArgs

    cfg = PointBertConfig(
        trans_dim=48, depth=2, drop_path_rate=0.0, num_heads=4,
        group_size=8, num_group=16, encoder_dims=32,
    )
    dcfg = DvaeConfig(
        group_size=8, num_group=16, encoder_dims=32, tokens_dims=32,
        decoder_dims=32, num_tokens=64,
    )
    args = TaskArgs(
        dataset_name="synthetic", npoints=64, batch_size=8, epochs=3,
        warmup_epochs=0, lr=1e-3, output_dir=str(tmp_path),
        exp_name="mpm_smoke", pretrained_dir="",
    )
    args.num_classes = 2
    args.samples_per_class = 8
    result = mpm_pretrain.main(args, config=cfg, dvae_config=dcfg, mask_ratio=0.4)
    hist = result["history"]
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["loss"])
    # the student should learn the (random but fixed) tokenizer's ids
    assert hist[-1]["loss"] < hist[0]["loss"]
