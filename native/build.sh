#!/bin/sh
# Build the native host-side library (ctypes-loaded; no pybind11 needed).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC fps.cpp -o libself6dpp_native.so
echo "built native/libself6dpp_native.so"
