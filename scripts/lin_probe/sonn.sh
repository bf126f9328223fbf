#!/usr/bin/env bash
# Linear probe on ScanObjectNN frozen features
set -euo pipefail
cd "$(dirname "$0")/../.."
python lp_feat_extractor.py --config configs/datasets/scanobjectnn.yaml \
  --model ULIP_PointBERT --exp_name lp_sonn "$@"
python linear_probe.py --exp_name lp_sonn "$@"
