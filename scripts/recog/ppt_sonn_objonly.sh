#!/usr/bin/env bash
# PPT recognition on ScanObjectNN obj_only — delegates to the published
# PPT-PTB grid point (reference scripts/recog/
# cls-pointbert-sonn_objonly-32v-front-dr07-h3-1.sh)
set -euo pipefail
exec "$(dirname "$0")/cls_sonn_objonly_dr07_h3.sh" --exp_name ppt_sonn_objonly "$@"
