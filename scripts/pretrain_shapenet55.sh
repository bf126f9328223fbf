#!/usr/bin/env bash
# ULIP contrastive pretraining on ShapeNet-55 (pc-text InfoNCE,
# frozen SLIP text tower)
set -euo pipefail
cd "$(dirname "$0")/.."
python main_pretrain.py --dataset_name shapenet --data_path data/shapenet-55 \
  --npoints 8192 --batch_size 64 --lr 3e-3 --epochs 250 \
  --exp_name pretrain_shapenet55 "$@"
