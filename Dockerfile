# torchok_tpu container recipe (reference ships a CUDA Dockerfile;
# /root/reference/Dockerfile — this is the TPU-VM equivalent).
#
# Build:  docker build -t torchok-tpu .
# Run on a Cloud TPU VM (the TPU driver is exposed via /dev and the
# privileged flag; see cloud.google.com/tpu docs):
#   docker run --privileged --net=host -v $PWD/data:/workspace/data \
#     torchok-tpu python -m torchok_tpu -cp examples/configs -cn <recipe>
FROM python:3.11-slim

# native IO kernels (torchok_tpu/native/io_kernels.cpp) build at first use
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libjpeg-dev libpng-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml LICENSE README.md ./
COPY torchok_tpu ./torchok_tpu
COPY configs ./configs
COPY examples ./examples

# libtpu comes from the jax[tpu] extra; on CPU-only hosts plain jax works
RUN pip install --no-cache-dir -e ".[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
 || pip install --no-cache-dir -e .

# persistent XLA compile cache across container restarts (mount a volume here)
ENV JAX_COMPILATION_CACHE_DIR=/workspace/.cache/torchok_tpu/jax

ENTRYPOINT ["python", "-m", "torchok_tpu"]
CMD ["-cp", "configs", "-cn", "smoke_synthetic"]
