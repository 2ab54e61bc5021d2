#!/usr/bin/env bash
# Build the native data-IO core (csrc/fsodtf_dataio.cpp).
set -e
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -fPIC -shared -fopenmp \
    -o build/libfsodtf_dataio.so csrc/fsodtf_dataio.cpp -ljpeg
echo "built build/libfsodtf_dataio.so"
