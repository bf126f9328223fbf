#!/usr/bin/env bash
# PPT-Base recognition on ModelNet10
# (reference scripts/recog/cls-pointbert-mn10-*.sh)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_base_mn40.yaml \
  --dataset_name modelnet10 --data_path data/modelnet10 \
  --exp_name ppt_base_mn10 "$@"
