#!/usr/bin/env bash
# Raw H36M ingestion (reference run_read_h36m.sh equivalent, TPU-host edition).
set -euo pipefail
SRC=${1:?usage: ingest.sh <raw_h36m_root> <out_root>}
OUT=${2:?usage: ingest.sh <raw_h36m_root> <out_root>}
python -m h36x.cli.ingest --source-dir "$SRC" --out-dir "$OUT"
