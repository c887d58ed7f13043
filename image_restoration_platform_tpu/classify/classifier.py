"""Degradation classifier: 7 confidence scores in [0,1] as ONE fused XLA program.

Behavioural contract from the reference (server-node/src/services/classifier.js):
scores {blur, noise, lowLight, compression, scratch, fade, colorShift}, each in
[0, 1], computed from cheap image statistics. The reference runs seven separate
sharp/libvips CPU pipelines per request (classifier.js:63-69), re-decoding and
re-convolving the image each time; here the whole analysis is a single jitted
program — grayscale, three 3x3 stencils, a gaussian blur and all reductions
fuse into one device launch, with per-shape executable caching.

Score semantics (file:line refer to /root/reference/server-node/src/services/classifier.js):
  blur        1 - min(var(clamp(lap8(gray)))/1000, 1)            (:104-127)
  noise       min(std(clamp(hp9(gray)))/50, 1)                   (:132-151)
  lowLight    brightness<0.3 ? min((0.3-b)*2, 1) : 0             (:156-172)
  compression jpeg only: min(max(var(img)-var(blur1(img)),0)/500, 1)  (:177-191, 288-308)
  scratch     min(stride-4 paired-threshold count/1000, 1)       (:196-215, 310-337)
  fade        min((1-colorfulness)*0.6 + (1-contrast)*0.4, 1)    (:220-233)
  colorShift  min(max channel mean deviation * 2, 1)             (:238-258)
with colorfulness = ||channel stdevs||/255 (:272-281) and contrast =
mean(stdev)/64 (:283-286). libvips clamps convolution output to bytes; we
reproduce that (see ops/stencil.py) since the normalisation constants are
calibrated to clamped-byte statistics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..obs.tracing import get_tracer
from ..utils.logging import get_logger
from ..ops.stencil import (
    K_HIGHPASS9,
    K_LAPLACIAN4,
    K_LAPLACIAN8,
    conv3x3_clamped_u8,
    gaussian_blur,
    grayscale,
)
from ..ops.stats import channel_stats, flat_variance

DEGRADATION_TYPES = {
    "blur": "Motion blur or out-of-focus areas",
    "noise": "Grain and digital noise",
    "lowLight": "Underexposed or shadow detail loss",
    "compression": "JPEG artifacts and quality loss",
    "scratch": "Physical damage and blemishes",
    "fade": "Color loss and contrast reduction",
    "colorShift": "White balance and color cast issues",
}

# canonical ordering: this is also the layout of the model conditioning vector
DEGRADATION_ORDER = tuple(DEGRADATION_TYPES.keys())

_SCRATCH_THRESHOLD = 200.0


def _scratch_line_count(edge: jax.Array) -> jax.Array:
    """Vectorised version of the stride-4 linear-feature scan (classifier.js:310-337).

    The reference samples every 4th pixel and, when the sample exceeds the
    threshold, counts whether its immediate right / bottom neighbour also
    exceeds it. That double loop is O(W*H/16) interpreted JS; here it is two
    shifted masks and a strided reduction fused into the main program.
    """
    mask = edge > _SCRATCH_THRESHOLD
    right = jnp.pad(mask, ((0, 0), (0, 1)))[:, 1:]
    down = jnp.pad(mask, ((0, 1), (0, 0)))[1:, :]
    v = jnp.sum((mask & right)[::4, ::4].astype(jnp.float32))
    h = jnp.sum((mask & down)[::4, ::4].astype(jnp.float32))
    return v + h


@partial(jax.jit, static_argnames=("is_jpeg",))
def classify_scores(img_u8: jax.Array, is_jpeg: bool = False) -> dict[str, jax.Array]:
    """All seven degradation scores for an [H, W, 3] uint8 image, one launch."""
    img = img_u8.astype(jnp.float32)
    gray = grayscale(img)

    # blur (classifier.js:104-127)
    lap8 = conv3x3_clamped_u8(gray, K_LAPLACIAN8)
    edge_var = flat_variance(lap8)
    blur = jnp.maximum(0.0, 1.0 - jnp.minimum(edge_var / 1000.0, 1.0))

    # noise (classifier.js:132-151)
    hp9 = conv3x3_clamped_u8(gray, K_HIGHPASS9)
    noise = jnp.minimum(jnp.sqrt(flat_variance(hp9)) / 50.0, 1.0)

    # channel statistics shared by lowLight / fade / colorShift
    ch_mean, ch_std = channel_stats(img)

    # lowLight (classifier.js:156-172)
    brightness = jnp.mean(ch_mean) / 255.0
    low_light = jnp.where(
        brightness < 0.3, jnp.minimum((0.3 - brightness) * 2.0, 1.0), 0.0
    )

    # compression: jpeg-only blockiness heuristic (classifier.js:288-308)
    if is_jpeg:
        blurred = jnp.clip(jnp.round(gaussian_blur(img, 1.0)), 0.0, 255.0)
        delta = jnp.maximum(0.0, flat_variance(img) - flat_variance(blurred))
        compression = jnp.minimum(delta / 500.0, 1.0)
    else:
        compression = jnp.asarray(0.0, dtype=jnp.float32)

    # scratch (classifier.js:196-215, 310-337)
    lap4 = conv3x3_clamped_u8(gray, K_LAPLACIAN4)
    scratch = jnp.minimum(_scratch_line_count(lap4) / 1000.0, 1.0)

    # fade (classifier.js:220-233, 272-286)
    colorfulness = jnp.minimum(jnp.sqrt(jnp.sum(jnp.square(ch_std[:3]))) / 255.0, 1.0)
    contrast = jnp.minimum(jnp.mean(ch_std) / 64.0, 1.0)
    fade = jnp.minimum((1.0 - colorfulness) * 0.6 + (1.0 - contrast) * 0.4, 1.0)

    # colorShift (classifier.js:238-258)
    avg_mean = jnp.mean(ch_mean[:3])
    deviation = jnp.where(
        avg_mean > 0.0, jnp.max(jnp.abs(ch_mean[:3] - avg_mean)) / avg_mean, 0.0
    )
    color_shift = jnp.minimum(deviation * 2.0, 1.0)

    return {
        "blur": blur,
        "noise": noise,
        "lowLight": low_light,
        "compression": compression,
        "scratch": scratch,
        "fade": fade,
        "colorShift": color_shift,
    }


def scores_to_vector(scores: dict[str, float]) -> np.ndarray:
    """Pack a score dict into the canonical 7-dim conditioning vector."""
    return np.asarray([float(scores[k]) for k in DEGRADATION_ORDER], dtype=np.float32)


_FALLBACKS = {
    # per-analyzer conservative fallbacks (classifier.js:125,149,170,189,213,231,256)
    "blur": 0.1,
    "noise": 0.1,
    "lowLight": 0.1,
    "compression": 0.0,
    "scratch": 0.05,
    "fade": 0.1,
    "colorShift": 0.1,
}


class ClassifierService:
    """Service facade matching ClassifierService.analyze() in the reference."""

    def __init__(self, logger=None):
        self.logger = logger or get_logger("classifier")
        self._tracer = get_tracer("classifier")

    def analyze_array(self, img: np.ndarray, fmt: str | None = None) -> dict[str, float]:
        """Classify a decoded [H, W, 3] uint8 array; ``fmt`` is the container
        format ('jpeg'/'png'/'webp') driving the jpeg-only compression score."""
        with self._tracer.span(
            "classifier.analyze",
            {
                "image.width": int(img.shape[1]),
                "image.height": int(img.shape[0]),
                "image.format": fmt or "raw",
                "classifier.version": "2.0.0-tpu",
            },
        ) as span:
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[-1] == 4:
                img = img[:, :, :3]
            try:
                device_scores = classify_scores(jnp.asarray(img), fmt == "jpeg")
                analysis = {k: float(v) for k, v in device_scores.items()}
            except Exception as error:  # pragma: no cover - device failure path
                self.logger.warn(
                    "Analysis failed on device, using fallback constants",
                    {"error": str(error)},
                )
                analysis = dict(_FALLBACKS)
                if fmt == "jpeg":
                    analysis["compression"] = 0.2

            top = sorted(
                ((k, v) for k, v in analysis.items() if v > 0.3),
                key=lambda kv: kv[1],
                reverse=True,
            )[:3]
            span.set_attributes(
                {
                    "classifier.top_issues": ",".join(f"{k}:{v:.2f}" for k, v in top),
                    "classifier.issue_count": len(top),
                }
            )
            self.logger.debug(
                "Analysis complete",
                {"topIssues": [{"type": k, "score": round(v, 2)} for k, v in top]},
            )
            return analysis

    def analyze(self, image_bytes: bytes) -> dict[str, float]:
        """Classify an encoded image (decodes via the imageio host stage)."""
        from ..imageio import decode_image

        decoded = decode_image(image_bytes)
        return self.analyze_array(decoded.pixels, decoded.format)

    @staticmethod
    def get_degradation_types() -> dict[str, str]:
        return dict(DEGRADATION_TYPES)


def create_classifier_service(**kwargs) -> ClassifierService:
    return ClassifierService(**kwargs)
