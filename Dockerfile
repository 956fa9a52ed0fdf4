# TPU image for llm_lns_quantization_tpu (counterpart of the reference's
# CUDA Dockerfile). Use a Cloud TPU VM base or any image with libtpu; jax[tpu]
# brings the runtime.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git zstd coreutils \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/llm_lns_quantization_tpu
COPY . .

RUN pip install --no-cache-dir -U pip \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
        numpy transformers datasets safetensors optax \
        scikit-learn sacrebleu zstandard pytest \
    && pip install --no-cache-dir -e . \
    && python setup.py build_ext --inplace

ENTRYPOINT ["python", "main.py"]
