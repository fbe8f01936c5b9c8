#!/usr/bin/env bash
# Misalignment-detector training launcher — the analogue of the reference's
# SLURM job (run_train_misalignment.sh: 1x A100, conda, cuda module). On a
# TPU VM there is no scheduler dance; this replays the reference's
# production hyperparameters (`run_train_misalignment.sh:31-41`) and
# forwards any overrides.
set -euo pipefail
cd "$(dirname "$0")/.."

exec python -m avsync.cli misalign-train \
    --max_samples 3300 \
    --epochs 20 \
    --max_shift_frames 20 \
    --hidden_dim 512 \
    --batch_size 64 \
    --save_every 5 \
    --verbose \
    "$@"
