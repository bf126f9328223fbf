#!/usr/bin/env bash
# Convert the reference's PyTorch checkpoints into flax msgpack trees.
# Expects the original downloads under data/initialize_models and
# data/pretrained_models (same layout as the reference README).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p data/pretrained_models
python -m ppt_tpu.tools.ckpt_convert --src data/initialize_models/slip_base_100ep.pt \
  --kind slip --out data/pretrained_models/slip_text.msgpack
for name in pointbert pointbert_ulip2; do
  if [ -f "data/pretrained_models/${name}.pt" ]; then
    python -m ppt_tpu.tools.ckpt_convert --src "data/pretrained_models/${name}.pt" \
      --kind pointbert --out "data/pretrained_models/${name}.msgpack"
  fi
done
if [ -f data/pretrained_models/pointnet2_ssg.pt ]; then
  python -m ppt_tpu.tools.ckpt_convert --src data/pretrained_models/pointnet2_ssg.pt \
    --kind pointnet2_ssg --out data/pretrained_models/pointnet2_ssg.msgpack
fi
