#!/usr/bin/env bash
# One-batch debug dump (reference teste.sh equivalent).
set -euo pipefail
FEATURES=${1:?usage: debug_batch.sh <features_root> [out.npz]}
OUT=${2:-debug_batch.npz}
python -m h36x.cli.debug_batch --root "$FEATURES" --out "$OUT"
