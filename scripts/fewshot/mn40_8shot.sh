#!/usr/bin/env bash
# Few-shot 8-shot prompt tuning on ModelNet40-FS
# (reference scripts/fewshot/pointbert-mn40-32v-middle-mlp_head-8s-3.sh)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_fewshot.py --config configs/experiments/fewshot_mn40.yaml \
  --nshots 8 --exp_name fewshot_mn40_8shot "$@"
