#!/usr/bin/env bash
# TPU training launcher — the HPC-launcher equivalent of the reference's
# slurm_scripts/slurm_script.sh (1 node / 1 accelerator there; here a TPU VM).
# Usage: scripts/tpu_launch.sh [extra adsr_tpu.cli.main flags]
set -euo pipefail
cd "$(dirname "$0")/.."

export ADSR_TPU_CACHE="${ADSR_TPU_CACHE:-$HOME/.cache/adsr_tpu_xla}"

python -m adsr_tpu.cli.main \
  --model-type drct \
  --dataset mvtec \
  --classe grid \
  --resolution 128 \
  --scale 4 \
  --epochs 100 \
  --batch-size 16 \
  --precision bf16 \
  "$@"
