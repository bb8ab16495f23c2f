#!/usr/bin/env bash
# Audio captioner deployment (reference data/scripts/run_audio_captioner.sh:
# torchrun x8 GPUs, bs 128, 3 generations).
set -euo pipefail
output_dir=${1:-./output/audio_captioner}
pretrain_dir=${2:-./audio_captioner}
python -m mico_tpu.run \
  --config configs/caption-generation-audio.json \
  --pretrain_dir "$pretrain_dir" \
  --output_dir "$output_dir" \
  "${@:3}"
