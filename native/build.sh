#!/bin/sh
# Build the native host-side library (ctypes ABI, no pybind11 needed).
# Portable baseline ISA: no -march=native, so the artifact runs on any
# x86-64 host (the kernel is hash/scatter-bound, not SIMD-bound).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libaura_native.so hash_embedder.cpp spill_rerank.cpp
echo "built $(pwd)/libaura_native.so"
