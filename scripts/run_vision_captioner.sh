#!/usr/bin/env bash
# Vision captioner deployment (reference data/scripts/run_vision_captioner.sh:
# torchrun x8 GPUs, bs 64, 8 frames, 3 generations). TPU-native: one process
# per host over the whole mesh; run_cfg.multihost=true adds DCN init.
set -euo pipefail
output_dir=${1:-./output/vision_captioner}
pretrain_dir=${2:-./vision_captioner}
python -m mico_tpu.run \
  --config configs/caption-generation-vision.json \
  --pretrain_dir "$pretrain_dir" \
  --output_dir "$output_dir" \
  "${@:3}"
