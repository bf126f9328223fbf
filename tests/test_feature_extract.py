"""Feature-extraction pipeline end-to-end: lp_feat_extractor -> npz ->
linear probe; save_recog_feats logits dump."""

import os

import numpy as np
import pytest

from ppt_tpu.tasks.args import TaskArgs


@pytest.fixture(autouse=True)
def tiny_pointbert(monkeypatch):
    from ppt_tpu.nn import PointBert, PointBertConfig
    from ppt_tpu.models import ulip as ulip_mod

    tiny = PointBertConfig(
        trans_dim=48, depth=2, drop_path_rate=0.0, num_heads=4,
        group_size=8, num_group=16, encoder_dims=32,
    )
    monkeypatch.setitem(
        ulip_mod.MODEL_REGISTRY, "ULIP_PointBERT",
        lambda args: ulip_mod._make("ULIP_PointBERT", PointBert(tiny), 96, args),
    )
    yield


def _args(tmp_path, **kw):
    from ppt_tpu.nn.text import TextConfig

    defaults = dict(
        dataset_name="synthetic", model="ULIP_PointBERT", npoints=128,
        batch_size=8, num_learnable_prompt_tokens=4,
        output_dir=str(tmp_path), exp_name="feats", pretrained_dir="",
    )
    defaults.update(kw)
    args = TaskArgs(**defaults)
    args.num_classes = 3
    args.samples_per_class = 5
    args.text_config = TextConfig(width=64, layers=1, heads=4, embed_dim=64)
    return args


def test_lp_pipeline_end_to_end(tmp_path):
    from ppt_tpu.tasks import feature_extract, linear_probe

    out_dir = feature_extract.main(_args(tmp_path))
    train = np.load(os.path.join(out_dir, "train.npz"))
    assert train["feature_list"].shape[1] == 96  # pc_feat_dims
    assert len(train["feature_list"]) == len(train["label_list"])

    results = linear_probe.run_probe(
        os.path.join(out_dir, "train.npz"),
        os.path.join(out_dir, "test.npz"),
        num_run=1, num_step=1, shots=(2,),
    )
    assert 2 in results and np.isfinite(results[2][0])


def test_save_recog_feats(tmp_path):
    from ppt_tpu.tasks.feature_extract import save_recog_feats

    path = save_recog_feats(_args(tmp_path, exp_name="recog"))
    data = np.load(path)
    assert data["logits"].shape[1] == 3  # num classes
    assert data["feature_list"].shape[0] == data["logits"].shape[0]
