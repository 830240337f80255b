#!/usr/bin/env bash
# Multi-host feature extraction: coordination-free partition jobs.
# Run `extract_multihost.sh <root> <shared_out> <i> <N>` on host i of N,
# then merge once from any host:
#   h36x-merge-shards --parts <shared_out>/part_* --out <shared_out>/features
set -euo pipefail
ROOT=${1:?usage: extract_multihost.sh <ingested_root> <shared_out> <i> <N>}
OUT=${2:?shared output dir}
I=${3:?partition index}
N=${4:?partition count}
python -m h36x.cli.extract --root "$ROOT" --out "$OUT/part_$I" \
  --partition "$I/$N" --augment true "${@:5}"
