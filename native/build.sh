#!/bin/bash
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    scat_native.cpp -o libscat_native.so -ljpeg -lpng -lpthread
echo "built $(pwd)/libscat_native.so"
