#!/usr/bin/env bash
# Run the hermetic test suite (CPU backend, fake 8-device mesh).
# reference analogue: scripts/test.sh → ctest
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
