#!/bin/sh
# Build the native host-geometry library.
# Writes to a temp file then mv's into place so an interrupted build
# never leaves a truncated .so behind (dlopen "file too short").
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared \
    sm3det_tpu/native/rotated_geometry.cc \
    -o sm3det_tpu/native/libsm3det_geometry.so.tmp.$$
mv sm3det_tpu/native/libsm3det_geometry.so.tmp.$$ \
   sm3det_tpu/native/libsm3det_geometry.so
echo "built sm3det_tpu/native/libsm3det_geometry.so"
