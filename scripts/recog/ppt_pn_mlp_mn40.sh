#!/usr/bin/env bash
# PPT recognition with the ULIP_PN_MLP backbone on ModelNet40
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_base_mn40.yaml \
  --model ULIP_PN_MLP --exp_name ppt_pn_mlp_mn40 "$@"
