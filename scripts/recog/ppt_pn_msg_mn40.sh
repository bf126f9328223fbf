#!/usr/bin/env bash
# PPT recognition with the ULIP_PN_MSG backbone on ModelNet40
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_base_mn40.yaml \
  --model ULIP_PN_MSG --exp_name ppt_pn_msg_mn40 "$@"
