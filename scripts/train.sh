#!/usr/bin/env bash
# Phase-1 training (reference train.sh equivalent). Logs go to stdout; use
# your scheduler's redirection (the reference used SLURM #SBATCH headers).
set -euo pipefail
FEATURES=${1:?usage: train.sh <features_root> [outdir]}
OUTDIR=${2:-./runs/phase1}
python -m h36x.cli.train --train-root "$FEATURES" --outdir "$OUTDIR" \
  --optim.batch-size 16 --optim.lr 1e-4 --optim.epochs 50
