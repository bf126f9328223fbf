#!/usr/bin/env bash
# PPT recognition on ScanObjectNN obj_bg variant
# (reference scripts/recog/cls-pointbert-sonn_obj_bg-*.sh)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_ptb_sonn_hardest.yaml \
  --sonn_type obj_bg --exp_name ppt_sonn_objbg "$@"
