#!/bin/sh
# Build the native host runtime (libptruntime.so). Optional — every caller
# has a Python fallback.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libptruntime.so src/ptruntime.cc -lz
echo "built $(pwd)/libptruntime.so"
