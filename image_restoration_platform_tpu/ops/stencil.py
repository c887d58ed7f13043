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


# Single-to-3-channel images make terrible TPU conv operands: XLA assigns
# lane-starved T(2,128)/T(4,128) layouts and inserts relayout copies around
# every conv (profiled at ~5 ms of a 28 ms serving step). 3x3 stencils are
# instead expressed as shift-and-add — nine statically-shifted elementwise
# multiply-adds that XLA fuses into ONE VPU pass with the full W dim on lanes.


def _shifted_stencil(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """3x3 stencil of [H, W] f32 via fused shift-and-add, edge-replicated."""
    h, w = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    out = None
    for dy in range(3):
        for dx in range(3):
            kv = float(kernel[dy][dx])
            if kv == 0.0:
                continue
            term = kv * xp[dy : dy + h, dx : dx + w]
            out = term if out is None else out + term
    return out


def conv3x3_clamped_u8(gray: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Convolve a [H, W] f32 image in byte range and clamp like libvips uint8."""
    out = _shifted_stencil(gray.astype(jnp.float32), np.asarray(kernel))
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def conv3x3_multi_clamped_u8(gray: jax.Array, kernels: tuple) -> jax.Array:
    """All classifier stencils in one fused pass: [H, W] -> [H, W, K] clamped
    bytes, identical to K separate conv3x3_clamped_u8 calls (the stencils
    share the padded input and a single memory-bound traversal)."""
    x = gray.astype(jnp.float32)
    outs = [
        jnp.clip(jnp.round(_shifted_stencil(x, np.asarray(k))), 0.0, 255.0)
        for k in kernels
    ]
    return jnp.stack(outs, axis=-1)


@lru_cache(maxsize=16)
def _gaussian_kernel_1d(sigma: float) -> np.ndarray:
    # matches vips gaussblur support: radius covers +/-3 sigma
    radius = max(1, int(math.ceil(3.0 * sigma)))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _blur_planes(x: jax.Array, k: np.ndarray) -> jax.Array:
    """Separable blur of [..., H, W] planes via fused shift-and-add."""
    radius = (len(k) - 1) // 2
    h, w = x.shape[-2], x.shape[-1]
    pad_h = [(0, 0)] * (x.ndim - 2) + [(radius, radius), (0, 0)]
    xp = jnp.pad(x, pad_h, mode="edge")
    out = None
    for i, kv in enumerate(k):
        term = float(kv) * xp[..., i : i + h, :]
        out = term if out is None else out + term
    pad_w = [(0, 0)] * (x.ndim - 2) + [(0, 0), (radius, radius)]
    xp = jnp.pad(out, pad_w, mode="edge")
    out = None
    for i, kv in enumerate(k):
        term = float(kv) * xp[..., i : i + w]
        out = term if out is None else out + term
    return out


def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable gaussian blur of [H, W] or [H, W, C] f32, edge-replicated.

    Channel-last low-C images are transposed to channel-planar [C, H, W] so
    the shifted adds run with the full W dim on the 128-lane axis, then
    transposed back (two cheap copies versus lane-starved depthwise convs).
    """
    k = _gaussian_kernel_1d(float(sigma))
    x = img.astype(jnp.float32)
    if x.ndim == 2:
        return _blur_planes(x, k)
    return jnp.transpose(_blur_planes(jnp.transpose(x, (2, 0, 1)), k), (1, 2, 0))


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
