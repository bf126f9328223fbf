#!/usr/bin/env bash
# PPT-PTB: PointAdapter (head_type 3) on ScanObjectNN hardest
# (reference scripts/recog/cls-pointbert-sonn_hardest-32v-middle-dr05-h3-1.sh)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_ptb_sonn_hardest.yaml \
  --exp_name ppt_ptb_sonn_hardest "$@"
