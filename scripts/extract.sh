#!/usr/bin/env bash
# Feature extraction (reference preprocess_h36m.sh equivalent).
set -euo pipefail
ulimit -n 8192 || true
ROOT=${1:?usage: extract.sh <ingested_root> <features_out> [weights.pt]}
OUT=${2:?usage: extract.sh <ingested_root> <features_out> [weights.pt]}
WEIGHTS=${3:-}
python -m h36x.cli.extract --root "$ROOT" --out "$OUT" --augment true --stride 5 \
  ${WEIGHTS:+--weights "$WEIGHTS"}
