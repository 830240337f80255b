#!/usr/bin/env bash
# Test-set results + NPZ dump (reference results.sh equivalent).
set -euo pipefail
FEATURES=${1:?usage: results.sh <features_root> <ingested_root> <ckpt.msgpack> [out.npz]}
INGESTED=${2:?}
CKPT=${3:?}
OUT=${4:-outputs/batch_result_S9.npz}
python -m h36x.cli.results --features-root "$FEATURES" \
  --preprocessed-root "$INGESTED" --model-path "$CKPT" --out "$OUT"
