#!/bin/sh
# Build the native host-side library (ctypes ABI, no pybind11 needed).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libaura_native.so hash_embedder.cpp
echo "built $(pwd)/libaura_native.so"
