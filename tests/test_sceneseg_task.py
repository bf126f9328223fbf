"""Scene-segmentation driver: end-to-end tiny runs on an S3DIS fixture."""

import os

import numpy as np
import pytest

from ppt_tpu.tasks.sceneseg import SEG_MODELS, train_loop


class _Args:
    dataset_name = "s3dis"
    model = "ptseg"
    npoints = 512
    voxel_max = 512
    voxel_size = 0.1
    test_area = 5
    batch_size = 2
    epochs = 1
    lr = 1e-3
    seed = 0
    allow_synthetic_fallback = False

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _fixture(root, rng):
    raw = os.path.join(root, "raw")
    os.makedirs(raw)
    for area in (1, 5):
        for room in ("a", "b"):
            n = 900
            data = np.concatenate(
                [rng.rand(n, 3) * 4, rng.rand(n, 3) * 255,
                 rng.randint(0, 13, (n, 1))], axis=1
            ).astype(np.float32)
            np.save(os.path.join(raw, f"Area_{area}_{room}.npy"), data)


def test_sceneseg_registry_names():
    assert set(SEG_MODELS) == {"ptseg", "stratified", "randlanet", "baafnet"}


def test_sceneseg_ptseg_end_to_end(tmp_path, rng):
    _fixture(str(tmp_path), rng)
    out = train_loop(_Args(data_path=str(tmp_path)))
    assert out["history"], out
    assert np.isfinite(out["history"][0]["loss"])
    assert 0.0 <= out["best_miou"] <= 100.0


def test_sceneseg_randlanet_end_to_end(tmp_path, rng):
    _fixture(str(tmp_path), rng)
    out = train_loop(_Args(data_path=str(tmp_path), model="randlanet"))
    assert np.isfinite(out["history"][0]["loss"])


def test_s3dis_6fold_aggregation(tmp_path, rng):
    from ppt_tpu.tools.s3dis_6fold import aggregate
    from ppt_tpu.utils.metrics import ConfusionMatrix

    # two folds whose union is known
    cm_all = ConfusionMatrix(3)
    paths = []
    for fold in range(2):
        preds = rng.randint(0, 3, 500)
        labels = rng.randint(0, 3, 500)
        cm = ConfusionMatrix(3)
        cm.update(preds, labels)
        cm_all.update(preds, labels)
        p = tmp_path / f"fold{fold}.npz"
        np.savez(p, matrix=cm.matrix,
                 classnames=np.asarray(["a", "b", "c"], dtype=object))
        paths.append(str(p))
    out = aggregate(paths)
    assert out["folds"] == 2
    assert out["miou"] == round(cm_all.miou, 2)
    assert out["overall_accuracy"] == round(cm_all.overall_accuracy, 2)
    assert out["classnames"] == ["a", "b", "c"]
