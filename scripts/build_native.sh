#!/bin/bash
# Build the native host-side data ops library.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native/data_ops.cc -o native/libucd_data_ops.so
echo "built native/libucd_data_ops.so"
