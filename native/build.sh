#!/bin/sh
# Build the native host-ops shared library, degrading like data/native.py's
# auto-builder: full (libjpeg+libpng) -> JPEG-only -> pure compute ops.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libhostops.so hostops.cpp -ljpeg -lpng \
  || g++ -O3 -march=native -shared -fPIC -o libhostops.so hostops.cpp -ljpeg -DHOSTOPS_NO_PNG \
  || g++ -O3 -march=native -shared -fPIC -o libhostops.so hostops.cpp -DHOSTOPS_NO_JPEG -DHOSTOPS_NO_PNG
echo "built $(pwd)/libhostops.so"
