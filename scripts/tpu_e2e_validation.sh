#!/usr/bin/env bash
# Full-scale end-to-end validation on the real TPU chip: synthetic grid data at
# the reference smoke config (128px HR, x4), full-size DRCT, real CLI train ->
# evaluate. Writes a summary to workspace/tpu_e2e/summary.txt.
set -euo pipefail
cd "$(dirname "$0")/.."

WD="${1:-workspace/tpu_e2e}"
EPOCHS="${2:-2}"
mkdir -p "$WD"
cd "$WD"
export PYTHONPATH="$(cd ../.. 2>/dev/null && pwd):${PYTHONPATH:-}"
[ -d ../../adsr_tpu ] || export PYTHONPATH="$(pwd)/../..:${PYTHONPATH:-}"

python -m adsr_tpu.cli.prepare --hr-size 128 --scales 4 --classes grid \
    --synthetic --synthetic-train 24

python -m adsr_tpu.cli.main --model-type drct --classe grid \
    --resolution 128 --scale 4 --epochs "$EPOCHS" --batch-size 16 \
    --precision bf16 --run-tag tpu_e2e

RUN_DIR="$(ls -dt workspace/experiment/drct/mvtec_grid_128_X4* | head -1)"
echo "run dir: $RUN_DIR"

python -m adsr_tpu.cli.evaluate --run-dir "$RUN_DIR" \
    --json-out summary.json | tee summary.txt
