#!/usr/bin/env bash
# PPT-FFN (mlp head) on ScanObjectNN hardest
# (reference scripts/recog/cls-pointbert-sonn_hardest-32v-middle-mlp_head-1.sh)
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/datasets/scanobjectnn.yaml --sonn_type hardest \
  --model ULIP_PointBERT --ulip2 --head_type 2 \
  --num_learnable_prompt_tokens 32 --class_name_position middle \
  --data_ratio 1.0 --npoints 1024 --optim adamw --lr 3e-3 \
  --label_smoothing 0.2 --epochs 250 --batch_size 120 \
  --exp_name "$(basename "$0" .sh)" "$@"
