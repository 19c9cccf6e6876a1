#!/bin/sh
# Build the native data-plane components (libavsr_native.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libavsr_native.so fbank.cpp
echo "built $(pwd)/libavsr_native.so"
