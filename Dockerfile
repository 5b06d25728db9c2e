# Training/eval image for mmfn_tpu (reference Dockerfile analog — CUDA base
# replaced by a TPU-ready JAX stack; CARLA is only needed for live simulation).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential cmake g++ && rm -rf /var/lib/apt/lists/*

# TPU runtime: libtpu ships with the jax[tpu] extra on Cloud TPU VMs.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax numpy pyyaml pillow opencv-python-headless pytest

WORKDIR /workspace
COPY . /workspace
RUN ./scripts/build_native.sh

CMD ["python", "-m", "pytest", "tests/", "-x", "-q"]
