#!/bin/bash
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
# no -march=native: the .so may outlive the build machine (containers,
# cached layers); generic x86-64 + O3 keeps it portable
g++ -O3 -fPIC -shared -std=c++17 \
    scat_native.cpp -o libscat_native.so -ljpeg -lpng -lpthread
echo "built $(pwd)/libscat_native.so"
