#!/usr/bin/env bash
# PPT recognition with the ULIP_PN_SSG backbone on ModelNet40
set -euo pipefail
cd "$(dirname "$0")/../.."
python main_cls.py --config configs/experiments/ppt_base_mn40.yaml \
  --model ULIP_PN_SSG --exp_name ppt_pn_ssg_mn40 "$@"
