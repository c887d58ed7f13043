# Serving image. For TPU hosts, base on a libtpu-enabled image and install
# jax[tpu] instead of jax[cpu].
FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make libjpeg-dev libpng-dev libwebp-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY image_restoration_platform_tpu ./image_restoration_platform_tpu
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir "jax[cpu]" optax orbax-checkpoint aiohttp pillow scipy \
    && make -C image_restoration_platform_tpu/imageio/csrc

# Fail-fast on missing secrets by default; set ALLOW_DEGRADED=1 explicitly
# for local dev runs with in-memory fakes.
ENV PORT=8080 LOG_LEVEL=info
EXPOSE 8080
CMD ["python", "-m", "image_restoration_platform_tpu.api"]
