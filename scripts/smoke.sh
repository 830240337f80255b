#!/usr/bin/env bash
# Pre-commit gate: the smoke tier (~3.5 min) — one fast happy-path test per
# subsystem, selected centrally in tests/conftest.py (_SMOKE). The full
# suite (430+ tests, ~33 min serial) remains the milestone gate:
#   python -m pytest tests/ -q
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m smoke -q "$@"
