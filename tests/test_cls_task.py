"""End-to-end cls task driver smoke: 2 epochs on synthetic data with a
tiny model config, checkpoint save + reload, eval path."""

import os

import numpy as np
import pytest

from ppt_tpu.tasks.args import TaskArgs


def _tiny_args(tmp_path, **kw):
    defaults = dict(
        dataset_name="synthetic",
        model="ULIP_PointBERT",
        npoints=128,
        batch_size=8,
        epochs=2,
        warmup_epochs=1,
        num_learnable_prompt_tokens=4,
        class_name_position="end",
        label_smoothing=0.2,
        output_dir=str(tmp_path),
        exp_name="smoke",
        pretrained_dir="",
        eval_freq=1,
    )
    defaults.update(kw)
    args = TaskArgs(**defaults)
    args.num_classes = 4
    args.samples_per_class = 6
    from ppt_tpu.nn.text import TextConfig

    args.text_config = TextConfig(width=64, layers=2, heads=4, embed_dim=64)
    return args


@pytest.fixture(autouse=True)
def tiny_pointbert(monkeypatch):
    """Shrink the PointBERT factory for CPU test speed."""
    from ppt_tpu.nn import PointBert, PointBertConfig
    from ppt_tpu.models import ulip as ulip_mod

    tiny = PointBertConfig(
        trans_dim=48, depth=12, drop_path_rate=0.0, num_heads=4,
        group_size=8, num_group=16, encoder_dims=32,
    )

    def tiny_factory(args):
        return ulip_mod._make("ULIP_PointBERT", PointBert(tiny), 96, args)

    monkeypatch.setitem(ulip_mod.MODEL_REGISTRY, "ULIP_PointBERT", tiny_factory)
    yield


def test_cls_train_and_eval(tmp_path):
    from ppt_tpu.tasks import cls

    args = _tiny_args(tmp_path)
    result = cls.main(args)
    assert result["best_epoch"] >= 0
    assert np.isfinite(result["best_acc"])
    ckpt_dir = os.path.join(str(tmp_path), "smoke")
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_best.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_best.json"))

    # eval-only path reloading the saved checkpoint
    eval_args = _tiny_args(tmp_path, evaluate_3d=True, test_ckpt_addr=ckpt_dir)
    eval_result = cls.main(eval_args)
    assert np.isfinite(eval_result["best_acc"])


def test_cls_resume(tmp_path):
    """--resume restores the trainable partition + optimizer state and
    continues from the recorded epoch."""
    from ppt_tpu.tasks import cls

    args = _tiny_args(tmp_path, epochs=2)
    cls.main(args)
    ckpt_dir = os.path.join(str(tmp_path), "smoke")

    resume_args = _tiny_args(tmp_path, epochs=4, resume=ckpt_dir)
    result = cls.main(resume_args)
    # resumed run starts after the saved best epoch
    epochs_run = [h["epoch"] for h in result["history"]]
    assert min(epochs_run) >= 1
    assert max(epochs_run) == 3


def test_cls_multi_step_dispatch(tmp_path):
    """steps_per_dispatch>1 trains via the scan path and still converges
    to a checkpoint."""
    from ppt_tpu.tasks import cls

    args = _tiny_args(tmp_path, epochs=2, steps_per_dispatch=2, exp_name="multi")
    result = cls.main(args)
    assert result["best_epoch"] >= 0
    assert np.isfinite(result["best_acc"])


def test_cls_voting_eval(tmp_path):
    """votes>1 averages logits over augmented eval copies."""
    from ppt_tpu.tasks import cls

    args = _tiny_args(tmp_path, epochs=1, votes=3, exp_name="vote")
    result = cls.main(args)
    assert np.isfinite(result["best_acc"])
