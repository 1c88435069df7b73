#!/bin/bash
# Build the native host-pipeline library.  The compile recipe lives in
# ONE place — scat_tpu/data/native_loader.py (_CXX_CMD) — this script
# just invokes it so manual builds and auto-builds can't drift.
set -e
cd "$(dirname "$0")/.."
PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" \
    exec python3 -m scat_tpu.data.native_loader --force
