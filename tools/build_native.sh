#!/bin/sh
# Build the native host-geometry library.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared \
    sm3det_tpu/native/rotated_geometry.cc \
    -o sm3det_tpu/native/libsm3det_geometry.so
echo "built sm3det_tpu/native/libsm3det_geometry.so"
