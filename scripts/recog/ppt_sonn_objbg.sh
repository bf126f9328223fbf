#!/usr/bin/env bash
# PPT recognition on ScanObjectNN obj_bg — delegates to the published
# PPT-PTB grid point (reference scripts/recog/
# cls-pointbert-sonn_objbg-32v-middle-dr09-h3-1.sh)
set -euo pipefail
exec "$(dirname "$0")/cls_sonn_objbg_dr09_h3.sh" --exp_name ppt_sonn_objbg "$@"
