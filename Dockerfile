# leadyolo_tpu runtime image. For Cloud TPU VMs the jax[tpu] wheel replaces
# the CPU wheel below (mirrors the reference's utils/docker/ images).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app
RUN pip install --no-cache-dir "jax[cpu]" flax optax chex einops numpy \
    opencv-python-headless pyyaml matplotlib pandas scipy tqdm psutil

# TPU VMs: pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
ENTRYPOINT ["python", "detect.py"]
