#!/usr/bin/env bash
# Build the optional native helpers (the Python package itself needs no
# build). reference analogue: scripts/build.sh (CMake).
set -euo pipefail
cd "$(dirname "$0")/.."
make -C native
echo "native helpers built: native/libnbody_native.so"
