"""Procedurally generated degraded-image fixtures (no binary assets).

Mirrors the reference's fixture generator
(/root/reference/server-node/tests/utils/imageFixtures.js:5-93) using numpy +
our own native codecs instead of sharp: flat-colour base, gaussian-blurred,
uniform-random noise, dark, colour-cast, low-quality re-encode, composited
diagonal scratch line, clean.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from image_restoration_platform_tpu import imageio

DEFAULT_SIZE = (128, 128)


def base_image(size=DEFAULT_SIZE, color=(180, 180, 180)) -> np.ndarray:
    h, w = size
    return np.tile(np.asarray(color, dtype=np.uint8)[None, None, :], (h, w, 1))


def encode(img: np.ndarray, quality: int = 95) -> bytes:
    return imageio.encode_jpeg(img, quality=quality, attach_srgb_icc=False)


def create_clean_image(size=DEFAULT_SIZE) -> bytes:
    return encode(base_image(size), quality=95)


def create_blurred_image(size=DEFAULT_SIZE) -> bytes:
    img = base_image(size).astype(np.float32)
    blurred = ndimage.gaussian_filter(img, sigma=(4, 4, 0))
    return encode(np.clip(blurred, 0, 255).astype(np.uint8), quality=60)


def create_noisy_image(size=DEFAULT_SIZE, seed: int = 7) -> bytes:
    h, w = size
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return encode(img, quality=80)


def create_dark_image(size=DEFAULT_SIZE) -> bytes:
    return encode(base_image(size, color=(10, 10, 10)), quality=95)


def create_color_shifted_image(size=DEFAULT_SIZE) -> bytes:
    return encode(base_image(size, color=(220, 80, 40)), quality=95)


def create_compressed_image(size=DEFAULT_SIZE) -> bytes:
    base = imageio.decode_image(create_clean_image(size)).pixels
    return encode(base, quality=15)


def create_scratched_image(size=DEFAULT_SIZE) -> bytes:
    h, w = size
    img = base_image(size).astype(np.float32)
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    dist = np.abs(xs - w / 2 + ys * 0.1)
    line = dist < 1.0
    img[line] = 255.0
    return encode(img.astype(np.uint8), quality=80)


def create_png_image(size=DEFAULT_SIZE) -> bytes:
    return imageio.encode_png(base_image(size))


def create_webp_image(size=DEFAULT_SIZE) -> bytes:
    return imageio.encode_webp(base_image(size))
