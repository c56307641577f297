#!/bin/sh
# Build the native ray-buffer builder (nerfsr_tpu/native/raygen.cpp).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    nerfsr_tpu/native/raygen.cpp -o nerfsr_tpu/native/libraygen.so
echo "built nerfsr_tpu/native/libraygen.so"
