#!/usr/bin/env bash
# Part segmentation on ShapeNetPart
# (reference scripts/partseg/partseg-pointbert-shapepart-32v-middle-2.sh,
# 6x2080Ti DDP there; one data-parallel mesh here)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_partseg.py --config configs/experiments/partseg_shapenetpart.yaml \
  --exp_name partseg_shapenetpart "$@"
