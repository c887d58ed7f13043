"""Typed configuration with environment overrides.

Reproduces the reference's three config tiers (see SURVEY.md section 5 and
/root/reference/server-node/src/config/secrets.js:1-38):

1. hard-required secrets asserted at boot (``assert_required_secrets``),
2. optional env knobs with inline defaults (same knob names as the reference
   where the contract demands it, e.g. ``RATE_LIMIT_USER_LIMIT``),
3. constructor-injected options on every service factory (DI for tests).
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field


# Required in production deployments (reference: config/secrets.js:1-8). In dev
# every consumer degrades to a local fake, mirroring the reference's mock tiers.
REQUIRED_SECRETS = (
    "FIRESTORE_CREDS",
    "REDIS_URL",
    "STRIPE_WEBHOOK_SECRET",
    "NEXT_PUBLIC_API_URL",
    "LOG_LEVEL",
)


def list_required_secrets() -> tuple[str, ...]:
    return REQUIRED_SECRETS


def assert_required_secrets(env: dict | None = None, *, exit_on_missing: bool = True) -> list[str]:
    """Fail-fast startup gate (reference: config/secrets.js:17-38).

    Returns the list of missing secrets; exits the process when
    ``exit_on_missing`` and anything is missing. ``ALLOW_DEGRADED=1`` is an
    explicit dev/TPU-bench opt-out (all external clients run as local fakes);
    the default is fail-fast, matching the reference's secrets.js gate.
    """
    env = env if env is not None else os.environ
    missing = [k for k in REQUIRED_SECRETS if not env.get(k)]
    if missing and env.get("ALLOW_DEGRADED", "0") != "1" and exit_on_missing:
        print(
            f"[secrets] Missing required secrets: {', '.join(missing)}. "
            "Set them in the environment (the reference injects them via Doppler).",
            file=sys.stderr,
        )
        raise SystemExit(1)
    return missing


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


@dataclass
class RateLimitConfig:
    # knob names follow the reference (middleware/rateLimit.js:74-84)
    user_limit: int = field(default_factory=lambda: _env_int("RATE_LIMIT_USER_LIMIT", 120))
    user_interval_s: int = field(default_factory=lambda: _env_int("RATE_LIMIT_USER_INTERVAL", 60))
    ip_limit: int = field(default_factory=lambda: _env_int("RATE_LIMIT_IP_LIMIT", 100))
    ip_interval_s: int = field(default_factory=lambda: _env_int("RATE_LIMIT_IP_INTERVAL", 60))


@dataclass
class UploadConfig:
    # reference: middleware/uploadValidation.js:6-9, imagePreprocess.js:4-5
    max_file_size_bytes: int = 10 * 1024 * 1024
    max_dimension: int = 2048
    jpeg_quality: int = 85
    max_images_per_call: int = 3
    accepted_mimes: tuple[str, ...] = ("image/jpeg", "image/png", "image/webp")
    accepted_extensions: tuple[str, ...] = (".jpg", ".jpeg", ".png", ".webp")
    retry_after_seconds: int = 60


@dataclass
class CreditsConfig:
    # reference: services/credits.js:14-16
    daily_free_limit: int = field(default_factory=lambda: _env_int("CREDITS_DAILY_FREE_LIMIT", 3))
    cache_ttl_seconds: int = 60


@dataclass
class QueueConfig:
    # reference: queues/jobQueue.js:4-9,37-45
    attempts: int = field(default_factory=lambda: _env_int("JOBS_MAX_ATTEMPTS", 5))
    backoff_base_ms: int = field(default_factory=lambda: _env_int("JOBS_BACKOFF_BASE_MS", 500))
    backoff_jitter: float = 0.3
    keep_completed: int = field(default_factory=lambda: _env_int("JOBS_KEEP_COMPLETED", 100))
    keep_failed: int = field(default_factory=lambda: _env_int("JOBS_KEEP_FAILED", 500))


@dataclass
class ServingConfig:
    # micro-batching loop over the device mesh (BASELINE.json config 5)
    max_batch: int = field(default_factory=lambda: _env_int("SERVE_MAX_BATCH", 8))
    max_wait_ms: float = field(default_factory=lambda: _env_float("SERVE_MAX_WAIT_MS", 5.0))
    # canonical device-side resolutions; requests are bucketed to these so every
    # batch hits a cached XLA executable (SURVEY.md "hard parts")
    size_buckets: tuple[int, ...] = field(
        default_factory=lambda: tuple(
            int(s)
            for s in os.environ.get("SERVE_SIZE_BUCKETS", "256,512,1024").split(",")
            if s
        )
    )
    batch_concurrency: int = field(
        default_factory=lambda: max(1, _env_int("RESTORATION_BATCH_CONCURRENCY", 3))
    )
    batch_delay_ms: int = field(default_factory=lambda: _env_int("RESTORATION_BATCH_DELAY_MS", 0))
    request_deadline_s: float = field(default_factory=lambda: _env_float("SERVE_DEADLINE_S", 120.0))
    # host/device overlap: how many batches may be in flight on the device at
    # once. 2 = double-buffering (batch N+1's H2D + launch overlap batch N's
    # execute + D2H); 1 = fully serialized (the round-2 behavior)
    pipeline_depth: int = field(default_factory=lambda: max(1, _env_int("SERVE_PIPELINE_DEPTH", 2)))
    # anti-starvation bound: when any queue's oldest request has waited longer
    # than this, the oldest-head queue is dispatched next regardless of depth
    fairness_age_ms: float = field(default_factory=lambda: _env_float("SERVE_FAIRNESS_AGE_MS", 50.0))
    # serve the UNet families in the W-folded layout (models/folded.py).
    # Width-pairs fold into lanes so small-channel convs fill the MXU — an
    # exact weight reparameterization that halves per-conv time in isolation
    # (17% -> 68% MFU on the full-res level). Whole-program, however, the
    # DEVICE-CLOCK A/B (scripts/measure_step_profiled.py, chip event times
    # via parse_xplane — immune to tunnel-degraded host timing) measures the
    # fold as a net LOSS on the flagship serving program: 22.53 folded vs
    # 20.96 unfolded ms/step at 512px b8 (v5e, 2026-08-19) — the folded
    # program's main fusion time is no longer lower (14.27 vs 13.96 ms) and
    # it pays ~1.8 ms of conv-bitcast relayouts + ~0.9 ms extra copies at
    # the fold boundaries. The earlier 1.19x host-timed win (2026-08-18,
    # measure_unet_fold.py) is superseded: host chain-differencing is
    # unreliable under tunnel degradation, and the stage-ablation A/B that
    # exposed this also found the executable cache was conflating stage
    # configs (engine._exec_key). Default OFF for the UNet families;
    # per-conv numbers in models/folded.py remain valid for the folded
    # SRNet path below.
    fold_w: bool = field(default_factory=lambda: _env_int("SERVE_FOLD_W", 0) == 1)
    # W-fold for the SR families: SRNet is the ideal fold case (pure stride-1
    # conv chain, no stats/attention boundaries), so its fold is a clean
    # ~1.9x on device time and defaults on
    fold_w_sr: bool = field(default_factory=lambda: _env_int("SERVE_FOLD_W_SR", 1) == 1)
    # spectral blind deblur stage (ops/deblur.py): PSF estimation + gated
    # Wiener deconvolution in front of the restore backbone. Measured round-4:
    # OOD defocus +2.3 dB / motion +3.7 dB, real-photo +1.6 / +4.4 dB, zero
    # false fires on 64 clean/JPEG images; non-firing images pass through
    # bit-identical, so this defaults on
    deblur: bool = field(default_factory=lambda: _env_int("SERVE_DEBLUR", 1) == 1)
    # JPEG deblocking stage (ops/deblock.py): quant-step estimation + gated
    # overcomplete shifted-grid DCT shrinkage in front of the backbone.
    # Measured round-4 on the flagship: jpeg axis e2e -1.04 -> -0.62 dB (OOD)
    # and -2.55 -> -1.38 dB (real corpus), zero movement on every other class
    # and on cleans (168-image false-fire audit: none); bit-identical off-fire
    deblock: bool = field(default_factory=lambda: _env_int("SERVE_DEBLOCK", 1) == 1)
    # high-bit-depth deconvolution pre-pass: 16-bit PNG uploads decode to
    # raw u16 and run the float Wiener deblur with the DISK (defocus)
    # channel enabled BEFORE 8-bit quantization (ops/deblur.py
    # deblur_canvas_f32) — at 16-bit precision a defocus disk's spectral
    # ring nulls carry real contrast, where the u8 serving canvas buries
    # them under the quantization floor (the physical gate documented in
    # round 4). 8-bit traffic is untouched by this flag.
    hdr_deblur: bool = field(default_factory=lambda: _env_int("SERVE_HDR_DEBLUR", 1) == 1)
    # space-to-depth IO for the space-to-depth-stem UNet families (unfolded
    # path): the global residual add happens in s2d layout and the single
    # depth-to-space permutation runs on the final uint8 tensor, so no
    # full-resolution bf16 [N,H,W,3] tensor exists in the serving program.
    # Those tensors use 3 of 128 TPU lanes; the 2026-08-19 per-op profile
    # attributes ~2 ms/step at 512px b8 to their layout copies + conversions.
    # Value-exact (f32 byte-identical; bf16 <=1 byte level from XLA's
    # graph-shape-dependent re-fusion rounding; tests/test_engine_s2d_io.py)
    s2d_io: bool = field(default_factory=lambda: _env_int("SERVE_S2D_IO", 1) == 1)
    # restore-path device egress: "yuv420" emits (Y, Cb, Cr) u8 planes from
    # the fused program — 1.5 B/px device->host instead of 3 B/px RGB — and
    # libjpeg consumes them raw (no host colorspace conversion). Same design
    # the tiled-SR path ships for the 2K->4K wall (BASELINE config 3); on the
    # ~34 MB/s v5e tunnel the 512px RGB fetch is ~23 ms of a ~94 ms single-
    # request p50. Output JPEGs become 4:2:0-subsampled (the web/camera
    # default) instead of 4:4:4; the restorator falls back to RGB whenever a
    # host resize is needed afterwards or the native codec is unavailable
    restore_egress: str = field(
        default_factory=lambda: os.environ.get("SERVE_RESTORE_EGRESS", "yuv420")
    )


@dataclass
class MeshConfig:
    # axis sizes; -1 means "use all remaining devices on the data axis"
    data: int = field(default_factory=lambda: _env_int("MESH_DATA", -1))
    tensor: int = field(default_factory=lambda: _env_int("MESH_TENSOR", 1))
    spatial: int = field(default_factory=lambda: _env_int("MESH_SPATIAL", 1))


@dataclass
class Config:
    port: int = field(default_factory=lambda: _env_int("PORT", 8080))
    log_level: str = field(default_factory=lambda: os.environ.get("LOG_LEVEL", "info"))
    health_metric_sample_size: int = field(
        default_factory=lambda: _env_int("HEALTH_METRIC_SAMPLE_SIZE", 1000)
    )
    rate_limit: RateLimitConfig = field(default_factory=RateLimitConfig)
    upload: UploadConfig = field(default_factory=UploadConfig)
    credits: CreditsConfig = field(default_factory=CreditsConfig)
    queue: QueueConfig = field(default_factory=QueueConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def load_config() -> Config:
    return Config()
