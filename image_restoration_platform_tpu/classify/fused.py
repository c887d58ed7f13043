"""Masked classification + conditioning as device functions for the fused path.

The serving pipeline letterboxes every image into a fixed square bucket
(256/512/1024) so XLA compiles a handful of programs total. Classification
must then ignore the edge-replicated padding: these are the masked variants of
classify_scores — every reduction runs over the valid (h, w) region only,
selected dynamically with a mask (no dynamic shapes, XLA-friendly).

conditioning_from_scores reproduces prompt/enhancer.py's selection logic
(threshold 0.3, top-3 by confidence, severity low/medium/high) as pure jnp so
the conditioning vector is built on device — classification, conditioning and
restoration fuse into ONE launch with no host round-trip in between
(north star: "decode -> classify -> conditioning -> restore as fused programs").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stencil import (
    K_HIGHPASS9,
    K_LAPLACIAN4,
    K_LAPLACIAN8,
    conv3x3_multi_clamped_u8,
    gaussian_blur,
    grayscale,
)

N_TYPES = 7  # DEGRADATION_ORDER length
_SCRATCH_THRESHOLD = 200.0


def _valid_mask(shape_hw, valid_h, valid_w):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape_hw, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape_hw, 1)
    return ((rows < valid_h) & (cols < valid_w)).astype(jnp.float32)


def _masked_mean(x, mask, count):
    return jnp.sum(x * mask) / count


def _masked_var(x, mask, count):
    mean = _masked_mean(x, mask, count)
    return jnp.sum(jnp.square(x - mean) * mask) / count


def masked_classify_scores(
    img: jax.Array,      # [B, B, 3] f32 in byte range (edge-padded canvas)
    valid_h: jax.Array,  # scalar int32
    valid_w: jax.Array,  # scalar int32
    is_jpeg: jax.Array,  # scalar f32 (0/1)
) -> jax.Array:
    """Seven degradation scores over the valid region, DEGRADATION_ORDER layout.

    Same score semantics as classify_scores (classifier.py docstring) with
    every reduction masked to the un-padded region.
    """
    gray = grayscale(img)
    hw = gray.shape
    mask = _valid_mask(hw, valid_h, valid_w)
    count = (valid_h * valid_w).astype(jnp.float32)

    # all three stencils in one conv pass (bit-identical to separate convs)
    stencils = conv3x3_multi_clamped_u8(gray, (K_LAPLACIAN8, K_HIGHPASS9, K_LAPLACIAN4))
    lap8, hp9, lap4 = stencils[:, :, 0], stencils[:, :, 1], stencils[:, :, 2]

    # blur
    blur = jnp.maximum(0.0, 1.0 - jnp.minimum(_masked_var(lap8, mask, count) / 1000.0, 1.0))

    # noise
    noise = jnp.minimum(jnp.sqrt(_masked_var(hp9, mask, count)) / 50.0, 1.0)

    # masked channel stats
    mask3 = mask[:, :, None]
    ch_mean = jnp.sum(img * mask3, axis=(0, 1)) / count
    ch_var = jnp.sum(jnp.square(img - ch_mean[None, None, :]) * mask3, axis=(0, 1)) / count
    ch_std = jnp.sqrt(ch_var)

    # lowLight
    brightness = jnp.mean(ch_mean) / 255.0
    low_light = jnp.where(brightness < 0.3, jnp.minimum((0.3 - brightness) * 2.0, 1.0), 0.0)

    # compression (jpeg-gated via multiply: computed unconditionally, fused)
    blurred = jnp.clip(jnp.round(gaussian_blur(img, 1.0)), 0.0, 255.0)
    count3 = count * 3.0
    var_orig = jnp.sum(jnp.square(img - jnp.sum(img * mask3) / count3) * mask3) / count3
    var_blur = jnp.sum(jnp.square(blurred - jnp.sum(blurred * mask3) / count3) * mask3) / count3
    compression = jnp.minimum(jnp.maximum(0.0, var_orig - var_blur) / 500.0, 1.0) * is_jpeg

    # scratch (stride-4 paired-threshold scan, masked)
    over = (lap4 > _SCRATCH_THRESHOLD) & (mask > 0)
    right = jnp.pad(over, ((0, 0), (0, 1)))[:, 1:]
    down = jnp.pad(over, ((0, 1), (0, 0)))[1:, :]
    pairs = (
        jnp.sum((over & right)[::4, ::4].astype(jnp.float32))
        + jnp.sum((over & down)[::4, ::4].astype(jnp.float32))
    )
    scratch = jnp.minimum(pairs / 1000.0, 1.0)

    # fade
    colorfulness = jnp.minimum(jnp.sqrt(jnp.sum(jnp.square(ch_std[:3]))) / 255.0, 1.0)
    contrast = jnp.minimum(jnp.mean(ch_std) / 64.0, 1.0)
    fade = jnp.minimum((1.0 - colorfulness) * 0.6 + (1.0 - contrast) * 0.4, 1.0)

    # colorShift
    avg_mean = jnp.mean(ch_mean[:3])
    deviation = jnp.where(
        avg_mean > 0.0, jnp.max(jnp.abs(ch_mean[:3] - avg_mean)) / avg_mean, 0.0
    )
    color_shift = jnp.minimum(deviation * 2.0, 1.0)

    return jnp.stack([blur, noise, low_light, compression, scratch, fade, color_shift])


def conditioning_from_scores(scores: jax.Array) -> jax.Array:
    """[7] scores -> [28] conditioning vector; device analog of
    prompt.enhancer.conditioning_vector (threshold 0.3, top-3, severity)."""
    eligible = scores > 0.3
    ranked = jnp.where(eligible, scores, -1.0)
    order = jnp.argsort(-ranked)  # descending; ineligible sink to the end
    top3 = order[:3]
    selected = jnp.zeros((N_TYPES,), dtype=jnp.bool_).at[top3].set(True) & eligible

    sev_idx = jnp.where(scores >= 0.7, 2, jnp.where(scores >= 0.5, 1, 0))
    sev_onehot = jax.nn.one_hot(sev_idx, 3, dtype=jnp.float32)  # [7, 3]
    onehot = sev_onehot * (scores * selected.astype(jnp.float32))[:, None]
    return jnp.concatenate([scores, onehot.reshape(-1)])


def batch_classify_and_condition(canvas_f32, valid_hw, is_jpeg_f):
    """[N,B,B,3], [N,2] int32, [N] f32 -> (scores [N,7], cond [N,28])."""
    scores = jax.vmap(masked_classify_scores)(
        canvas_f32, valid_hw[:, 0], valid_hw[:, 1], is_jpeg_f
    )
    cond = jax.vmap(conditioning_from_scores)(scores)
    return scores, cond
