#!/usr/bin/env bash
# Prompt-only on ScanObjectNN obj_only, 70% data, FRONT class position
# (reference scripts/recog/cls-pointbert-sonn_objonly-32v-front-dr07-h0-1.sh)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/datasets/scanobjectnn.yaml --sonn_type obj_only \
  --model ULIP_PointBERT --ulip2 --head_type 0 \
  --num_learnable_prompt_tokens 32 --class_name_position front \
  --data_ratio 0.7 --npoints 1024 --optim adamw --lr 3e-3 \
  --label_smoothing 0.2 --epochs 250 --batch_size 30 \
  --exp_name "$(basename "$0" .sh)" "$@"
