#!/bin/sh
# Build the native host-runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libpf_native.so pf_native.cpp
echo "built $(pwd)/libpf_native.so"
