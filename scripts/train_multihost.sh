#!/usr/bin/env bash
# Multi-host phase-1 training: run this SAME script on every host of the
# pod/cluster (e.g. one SLURM task per host). The feature store must be on
# shared storage. Process id resolves from the cluster environment when the
# launcher provides one (TPU pod / SLURM); pass it explicitly otherwise.
set -euo pipefail
FEATURES=${1:?usage: train_multihost.sh <features_root> <coordinator host:port> <num_hosts> [process_id] [outdir]}
COORD=${2:?coordinator host:port (host 0)}
NPROC=${3:?number of hosts}
PID=${4:--1}
OUTDIR=${5:-./runs/phase1}
python -m h36x.cli.train --train-root "$FEATURES" --outdir "$OUTDIR" \
  --dist.coordinator "$COORD" --dist.num-processes "$NPROC" \
  --dist.process-id "$PID" \
  --optim.batch-size 32 --optim.lr 1e-4 --optim.epochs 50 "${@:6}"
