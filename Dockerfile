# Container for sparse_caption_tpu (capability parity: reference Dockerfile,
# which ships a CUDA/PyTorch + Java environment; this image targets TPU VMs
# and CPU CI instead).
#
#   docker build -t sparse-caption-tpu .
#   docker run --rm --privileged -v $PWD/runs:/workspace/runs sparse-caption-tpu \
#       python -m pytest tests/ -q
#
# On a Cloud TPU VM, --privileged (or --device /dev/accel*) exposes the chips;
# jax[tpu] picks them up automatically. Everything also runs on CPU
# (JAX_PLATFORMS=cpu), including the full test suite on the virtual
# 8-device mesh.

FROM python:3.12-slim

ARG DEBIAN_FRONTEND=noninteractive
RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential \
    curl \
    git \
    unzip \
    wget \
    # optional: Java runtime for the METEOR/SPICE jar wrappers
    # (BLEU/ROUGE/CIDEr are self-contained Python and need nothing)
    default-jre-headless \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY . /workspace

# jax[tpu] resolves to the TPU-enabled jaxlib on TPU VMs and plain CPU
# jaxlib elsewhere; torch (CPU) is only needed for reference-checkpoint
# conversion and can be dropped for slim serving images.
RUN pip install --no-cache-dir -U pip \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e .[dev] \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

# native fast paths (C++ CIDEr-D/BLEU reward scorer + batch tokenizer);
# pure-Python fallbacks exist, so failures are non-fatal
RUN sh native/build.sh || true

ENV XLA_FLAGS=""
CMD ["python", "-m", "pytest", "tests/", "-q"]
