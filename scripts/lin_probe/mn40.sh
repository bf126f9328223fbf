#!/usr/bin/env bash
# Linear probe: frozen PointBERT features + logistic regression
# (reference scripts/lin_probe/fs-mn40-*.sh; two stages)
set -euo pipefail
cd "$(dirname "$0")/../.."
python lp_feat_extractor.py --config configs/datasets/modelnet40.yaml \
  --model ULIP_PointBERT --exp_name lp_mn40 "$@"
python linear_probe.py --exp_name lp_mn40 "$@"
