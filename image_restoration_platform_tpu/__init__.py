"""image_restoration_platform_tpu — a TPU-native image restoration framework.

A ground-up rebuild of the capabilities of ``RazonIn4K/image-restoration-platform``
(reference mounted at /root/reference) as a TPU-first system:

- the per-request chain decode -> resize/normalize -> degradation classification ->
  meta-prompt/conditioning selection -> restoration model -> tile-blend -> re-encode
  runs as fused JAX/XLA programs with Pallas kernels for the hot ops;
- the web service contracts (problem+json errors, idempotency, rate limiting,
  credits, moderation, health/readiness) are preserved behind an aiohttp API;
- serving is continuous micro-batching over a ``jax.sharding.Mesh`` (DP x TP x SP).

Layer map (mirrors SURVEY.md section 7):

    api/        HTTP surface (aiohttp): /v1/jobs, /health, SSE streams
    serve/      restorator orchestration, micro-batcher, jobs, credits, moderation
    classify/   degradation classifier as a single jitted XLA program
    prompt/     degradation template -> text prompt + model conditioning vector
    models/     restoration backbones (conditioned U-Net, SR net, diffusion)
    ops/        device kernels: resize, stencils, stats, tiling, Pallas overlap-blend
    parallel/   mesh construction, sharding policies, halo exchange
    imageio/    C++ host codec stage (libjpeg/libpng/libwebp) with zero-copy numpy
    obs/        tracing spans, request metrics, device profiling
    utils/      retry, logging, misc
"""

__version__ = "0.1.0"
