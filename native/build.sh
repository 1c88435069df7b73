#!/bin/bash
# Build the native host-pipeline library.  The compile recipe lives in
# ONE place — scat_tpu/data/native_loader.py (_CXX_CMD) — this script
# runs that file STANDALONE (runpy, no scat_tpu package import), so a
# slim build container needs only python3 + numpy + g++/libjpeg/libpng,
# not the ML stack the package __init__ pulls in.
set -e
cd "$(dirname "$0")"
# checkout layout: native/ -> ../scat_tpu/data/native_loader.py
# wheel layout:  scat_tpu/_native/ -> ../data/native_loader.py
for rel in ../scat_tpu/data/native_loader.py ../data/native_loader.py; do
    if [ -f "$rel" ]; then
        exec python3 -c "import runpy, sys
sys.argv = ['native_loader', '--force']
runpy.run_path('$rel', run_name='__main__')"
    fi
done
echo "native_loader.py not found relative to $(pwd)" >&2
exit 1
