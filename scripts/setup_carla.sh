#!/usr/bin/env bash
# Fetch CARLA 0.9.10.1 for live closed-loop evaluation (reference
# scripts/setup_carla.sh analog). Only needed for `simulator: carla`; the
# fake-world harness and all training/benchmarks run without it.
set -euo pipefail
VERSION=${1:-0.9.10.1}
DEST=${2:-carla}
mkdir -p "$DEST"
URL="https://carla-releases.s3.us-east-005.backblazeb2.com/Linux/CARLA_${VERSION}.tar.gz"
echo "downloading CARLA ${VERSION} ..."
curl -L "$URL" | tar -xz -C "$DEST"
echo "install the python client:"
echo "  pip install ${DEST}/PythonAPI/carla/dist/carla-${VERSION%.*}*.whl || \\"
echo "  easy_install ${DEST}/PythonAPI/carla/dist/carla-*py3*.egg"
