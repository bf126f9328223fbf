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
    output_dir = "outputs"
    exp_name = "sceneseg_test"
    label_smoothing = 0.2

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


def test_sceneseg_checkpoint_resume(tmp_path, rng):
    """best-mIoU checkpoint is written and --resume restores it."""
    _fixture(str(tmp_path), rng)
    out_dir = str(tmp_path / "out")
    args = _Args(data_path=str(tmp_path), output_dir=out_dir,
                 exp_name="run1")
    train_loop(args)
    ckpt_dir = os.path.join(out_dir, "run1")
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_best.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))
    # resume: continues past the saved epoch without error
    args2 = _Args(data_path=str(tmp_path), output_dir=out_dir,
                  exp_name="run2", resume=ckpt_dir, epochs=2)
    out = train_loop(args2)
    assert out["history"][0]["epoch"] == 1  # resumed at saved epoch + 1


def test_sceneseg_missing_val_raises(tmp_path, rng):
    """No silent train-set fallback: missing val split fails loudly."""
    raw = os.path.join(str(tmp_path), "raw")
    os.makedirs(raw)
    n = 700
    for room in ("a", "b"):  # no Area_5 rooms -> no val split
        data = np.concatenate(
            [rng.rand(n, 3) * 4, rng.rand(n, 3) * 255,
             rng.randint(0, 13, (n, 1))], axis=1
        ).astype(np.float32)
        np.save(os.path.join(raw, f"Area_1_{room}.npy"), data)
    args = _Args(data_path=str(tmp_path),
                 output_dir=str(tmp_path / "out"))
    with pytest.raises(RuntimeError, match="val split"):
        train_loop(args)
    # with the explicit opt-in it proceeds and labels the metric
    args2 = _Args(data_path=str(tmp_path), output_dir=str(tmp_path / "out"),
                  allow_train_eval=True)
    out = train_loop(args2)
    assert out["history"]


def test_whole_scene_eval_covers_all_points(tmp_path, rng):
    """Whole-scene eval: every raw point is predicted (multi-voxel
    passes + wraparound tiles cover the union), mIoU well-defined."""
    _fixture(str(tmp_path), rng)
    args = _Args(data_path=str(tmp_path), output_dir=str(tmp_path / "out"),
                 eval_scene=True, votes=2, max_eval_passes=2,
                 cm_out=str(tmp_path / "cm.npz"))
    out = train_loop(args)
    assert "scene_miou" in out
    assert 0.0 <= out["scene_miou"] <= 100.0
    cm = np.load(str(tmp_path / "cm.npz"), allow_pickle=True)
    # every raw val point lands in the confusion matrix per vote subset:
    # with max_eval_passes capped the count is <= raw points * votes, > 0
    assert cm["matrix"].sum() > 0


def test_whole_scene_eval_exact_coverage(rng):
    """Unit check on the eval kernel itself: a constant-logit model
    predicts one class everywhere and the CM count equals the raw point
    count (every point covered exactly once after scatter-mean)."""
    from ppt_tpu.data.scenes import SceneDataset
    from ppt_tpu.tasks.sceneseg import whole_scene_eval

    n = 997  # deliberately not a multiple of the tile size
    coord = rng.rand(n, 3).astype(np.float32) * 3
    label = rng.randint(0, 4, n).astype(np.int64)
    ds = SceneDataset([(coord, None, label)], [f"c{i}" for i in range(4)],
                      "toy")

    def const_eval(params, batch_stats, batch):
        b, p = batch["pts"].shape[:2]
        out = np.zeros((b, p, 4), np.float32)
        out[:, :, 2] = 1.0
        return out

    cm = whole_scene_eval(
        const_eval, {}, {}, ds, npoints=128, num_classes=4,
        voxel_size=0.05, batch_size=2, num_votes=1, seed=0,
    )
    assert cm.matrix.sum() == n  # every raw point counted exactly once
    assert cm.matrix[:, 2].sum() == n  # all predicted class 2


def test_sceneseg_resume_restores_best_miou(tmp_path, rng):
    """Resume must restore the saved best metric so a worse first
    post-resume epoch cannot clobber checkpoint_best (VERDICT r3
    review finding)."""
    import json

    _fixture(str(tmp_path), rng)
    out_dir = str(tmp_path / "out")
    args = _Args(data_path=str(tmp_path), output_dir=out_dir,
                 exp_name="run1")
    train_loop(args)
    ckpt_dir = os.path.join(out_dir, "run1")
    meta_file = os.path.join(ckpt_dir, "checkpoint_best.json")
    # forge a high best so any real epoch is worse
    with open(meta_file) as f:
        meta = json.load(f)
    key = "miou" if "miou" in meta else "train_miou"
    meta[key] = 99.9
    with open(meta_file, "w") as f:
        json.dump(meta, f)
    ckpt_bytes = open(
        os.path.join(ckpt_dir, "checkpoint_best.msgpack"), "rb"
    ).read()
    args2 = _Args(data_path=str(tmp_path), output_dir=out_dir,
                  exp_name="run1", resume=ckpt_dir, epochs=2)
    out = train_loop(args2)
    # best not clobbered: reported best stays at the forged value and
    # the checkpoint file is byte-identical
    assert out["best_miou"] == 99.9
    assert open(
        os.path.join(ckpt_dir, "checkpoint_best.msgpack"), "rb"
    ).read() == ckpt_bytes
