#!/usr/bin/env bash
# PPT-Base recognition: PointBERT(ULIP-2) + 32 middle-position prompt
# tokens on ModelNet40 (reference scripts/recog/cls-pointbert-mn40-32v-
# middle-dr04-h0-1.sh). Single process drives the whole TPU mesh.
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_base_mn40.yaml \
  --exp_name ppt_base_mn40 "$@"
