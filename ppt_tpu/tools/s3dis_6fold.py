"""S3DIS 6-fold cross-validation aggregation.

Equivalent of the reference's
``examples/segmentation/test_s3dis_6fold.py``: train/eval six times with
``--test_area {1..6}``, save each run's confusion matrix, then sum the
matrices here — 6-fold metrics are computed over the UNION of points,
not by averaging per-fold mIoU (the reference makes the same point).

Usage:
  # each sceneseg run saves its confusion matrix:
  python -m ppt_tpu.tasks.sceneseg --dataset_name s3dis --test_area 1 \
      --cm_out outputs/s3dis_a1.npz
  ...
  python -m ppt_tpu.tools.s3dis_6fold outputs/s3dis_a*.npz
"""

from __future__ import annotations

import argparse
import glob
import json

import numpy as np

from ppt_tpu.utils.metrics import ConfusionMatrix


def aggregate(paths) -> dict:
    total = None
    classnames = None
    for p in paths:
        z = np.load(p, allow_pickle=True)
        m = z["matrix"]
        total = m if total is None else total + m
        if "classnames" in z:
            classnames = list(z["classnames"])
    if total is None:
        raise ValueError("no confusion matrices given")
    cm = ConfusionMatrix(total.shape[0])
    cm.matrix = total.astype(np.int64)
    out = {
        "folds": len(paths),
        "overall_accuracy": round(cm.overall_accuracy, 2),
        "mean_accuracy": round(cm.mean_accuracy, 2),
        "miou": round(cm.miou, 2),
        "ious": [round(float(x), 2) for x in cm.ious],
    }
    if classnames:
        out["classnames"] = classnames
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", help="per-fold .npz confusion matrices")
    args = ap.parse_args()
    paths = []
    for p in args.paths:
        paths.extend(sorted(glob.glob(p)) or [p])
    print(json.dumps(aggregate(paths)))


if __name__ == "__main__":
    main()
