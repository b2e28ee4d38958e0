#!/bin/sh
# Build the native host-ops shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libhostops.so hostops.cpp -ljpeg -lpng
echo "built $(pwd)/libhostops.so"
