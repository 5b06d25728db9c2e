#!/usr/bin/env bash
# Build the native OpenDRIVE -> .rmap vectorizer into native/build/.
set -euo pipefail
cd "$(dirname "$0")/../native"
mkdir -p build
if command -v cmake >/dev/null 2>&1; then
  (cd build && cmake -DCMAKE_BUILD_TYPE=Release .. >/dev/null && make -s)
else
  g++ -O2 -std=c++17 -Wall -o build/rough_map_node rough_map_node.cpp
fi
echo "built: native/build/rough_map_node"
