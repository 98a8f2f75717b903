#!/bin/bash
# Build the native host-side data ops library.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native/data_ops.cc -o native/libucd_data_ops.so
# mirror into the package so wheels/installs carry it (pyproject package-data)
mkdir -p ucd_tpu/lib
cp native/libucd_data_ops.so ucd_tpu/lib/
echo "built native/libucd_data_ops.so (+ ucd_tpu/lib copy)"
