#!/bin/sh
# Build the native map-core shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libmap_core.so map_core.cpp
echo "built $(pwd)/libmap_core.so"
