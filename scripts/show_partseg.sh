#!/usr/bin/env bash
# Render part-segmentation predictions as shaded-ball images
# (reference show-partseg.sh + notebook/show_balls.py)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m ppt_tpu.tools.visualize --npz "${1:?usage: show_partseg.sh preds.npz [out]}" --out "${2:-viz}"
