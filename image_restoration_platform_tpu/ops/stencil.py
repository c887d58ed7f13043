"""3x3 stencils and separable gaussian blur as XLA convolutions.

These replace the reference's libvips convolutions (classifier.js:107-115,
135-143, 199-207 and the sigma-1 blur at classifier.js:297). libvips convolves
uint8 images and clamps the result back to [0, 255]; the classifier's score
normalisations (variance/1000, stddev/50, thresholds at 200) are calibrated to
that clamped-byte behaviour, so we reproduce it: convolve in f32, round,
clamp to [0, 255].

All stencils run as one fused XLA program inside the classifier jit; on TPU the
3x3 convs lower to MXU-friendly ops and fuse with the downstream reductions.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Laplacian edge detector used for blur scoring (classifier.js:112)
K_LAPLACIAN8 = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], dtype=np.float32)
# High-pass used for noise scoring (classifier.js:140)
K_HIGHPASS9 = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], dtype=np.float32)
# 4-neighbour Laplacian used for scratch scoring (classifier.js:204)
K_LAPLACIAN4 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=np.float32)


def _conv2d_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME conv of a single-channel [H, W] image with edge replication."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x = jnp.pad(x, ((ph, ph), (pw, pw)), mode="edge")
    x4 = x[None, :, :, None]  # NHWC
    k4 = kernel[:, :, None, None]  # HWIO
    out = jax.lax.conv_general_dilated(
        x4,
        k4,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[0, :, :, 0]


def conv3x3_clamped_u8(gray: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Convolve a [H, W] f32 image in byte range and clamp like libvips uint8."""
    out = _conv2d_same(gray.astype(jnp.float32), jnp.asarray(kernel))
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def conv3x3_multi_clamped_u8(gray: jax.Array, kernels: tuple) -> jax.Array:
    """All classifier stencils in ONE conv: [H, W] -> [H, W, K] clamped bytes.

    Bit-identical to K separate conv3x3_clamped_u8 calls (independent output
    channels), but a single pass over the image — the classifier's three
    stencils (lap8/hp9/lap4) share one memory-bound traversal.
    """
    x = gray.astype(jnp.float32)
    x = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")[None, :, :, None]
    k4 = jnp.stack([jnp.asarray(k, jnp.float32) for k in kernels], axis=-1)[:, :, None, :]
    out = jax.lax.conv_general_dilated(
        x, k4, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0]
    return jnp.clip(jnp.round(out), 0.0, 255.0)


@lru_cache(maxsize=16)
def _gaussian_kernel_1d(sigma: float) -> np.ndarray:
    # matches vips gaussblur support: radius covers +/-3 sigma
    radius = max(1, int(math.ceil(3.0 * sigma)))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable gaussian blur of [H, W] or [H, W, C] f32, edge-replicated."""
    k = jnp.asarray(_gaussian_kernel_1d(float(sigma)))
    radius = (k.shape[0] - 1) // 2

    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]

    x = img.astype(jnp.float32)[None]  # NHWC
    c = x.shape[-1]
    # depthwise separable: blur rows then columns
    kv = jnp.tile(k[:, None, None, None], (1, 1, 1, c))  # HWIO with feature_group
    kh = jnp.tile(k[None, :, None, None], (1, 1, 1, c))

    x = jnp.pad(x, ((0, 0), (radius, radius), (0, 0), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    out = x[0]
    return out[:, :, 0] if squeeze else out


def grayscale(img: jax.Array) -> jax.Array:
    """Rec.709 luma of an [H, W, 3] byte-range image, rounded to byte values.

    sharp's .grayscale() goes through libvips b-w conversion; the classifier's
    thresholds only require byte-range luma, so we use the standard Rec.709
    weights and round to integers like the decoded buffer the reference sees.
    """
    if img.ndim == 2:
        return img.astype(jnp.float32)
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=jnp.float32)
    if img.shape[-1] == 1:
        return img[..., 0].astype(jnp.float32)
    y = jnp.tensordot(img[..., :3].astype(jnp.float32), w, axes=1)
    return jnp.clip(jnp.round(y), 0.0, 255.0)
