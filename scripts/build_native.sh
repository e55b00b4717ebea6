#!/bin/sh
# Build the native host-side scorers into native/libflexs_native.so.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o native/libflexs_native.so native/flexs_native.cc
echo "built native/libflexs_native.so"
