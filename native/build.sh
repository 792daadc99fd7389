#!/bin/sh
# Build libpointops.so (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libpointops.so pointops.cpp
echo "built $(pwd)/libpointops.so"
