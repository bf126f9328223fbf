#!/usr/bin/env bash
# Few-shot 4-shot prompt tuning on ScanObjectNN-FS
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_fewshot.py --config configs/experiments/fewshot_mn40.yaml \
  --dataset_name scanobjectnn_fs --data_path data/scanobjectnn \
  --nshots 4 --exp_name fewshot_sonn_4shot "$@"
