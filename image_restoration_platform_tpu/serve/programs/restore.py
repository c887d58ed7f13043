"""The fused restore program: ONE XLA launch per (family, bucket, batch).

masked classify -> conditioning -> gated deblock/deblur stages -> backbone
-> byte (or YCbCr-plane) egress. Replaces the reference's three-service
chain classify/enhance/external-restore (restorator.js:57-95) with a single
device program — no host round trips between stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models import get_family
from ...models import nn as mnn
from .egress import to_yuv420, to_yuv420_s2d


def build_restore_program(
    family_name: str,
    *,
    dtype,
    use_folded: bool,
    use_s2d_io: bool,
    use_deblur: bool,
    use_deblock: bool,
    egress: str = "rgb",
):
    """Jittable ``fn(params, canvas_u8, valid_hw, is_jpeg_f[, key])``.

    ``egress="yuv420"`` (standard restore families only): the program emits
    ((Y, Cb, Cr) u8 planes, scores) instead of (RGB u8, scores) — 1.5 B/px
    device->host instead of 3 B/px, consumed raw by libjpeg. SR families
    take the plain ``fn(params, imgs_u8)`` shape (no conditioning).
    """
    from ...classify.fused import batch_classify_and_condition

    family = get_family(family_name)
    cfg = family.config

    if family_name.startswith("sr-"):
        if use_folded:
            from ...models import folded

            sr_apply = folded.apply_srnet
        else:
            sr_apply = family.apply

        def sr_program(params, imgs_u8):
            x = imgs_u8.astype(dtype) / dtype(255.0)
            out = sr_apply(params, x, cfg)
            return jnp.clip(jnp.round(out.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.uint8)

        return jax.jit(sr_program)

    if use_folded:
        from ...models import folded

    # spectral blind deblur stage (ops/deblur.py): detect disk/motion PSFs
    # from the canvas spectrum and Wiener-invert before the backbone. The
    # learned model cannot carry the kernel through 28-dim conditioning
    # (~0 dB on OOD defocus after 40k deconv-training steps); the spectrum
    # identifies it directly. Non-firing images pass through bit-identical.
    # JPEG deblocking runs BEFORE deblur: blocking artifacts suppress the
    # deblur estimator's motion evidence, and its compression surcharge
    # should see the post-deblock compression score (ops/deblock.py).
    from ...ops.deblock import deblock_and_recondition as _deblock_and_recondition
    from ...ops.deblur import deblur_and_recondition as _deblur_and_recondition

    if family_name == "diffusion-restore":

        def diffusion_program(params, canvas_u8, valid_hw, is_jpeg_f, key):
            scores, cond = batch_classify_and_condition(
                canvas_u8.astype(jnp.float32), valid_hw, is_jpeg_f
            )
            stage_scores = scores
            if use_deblock:
                canvas_u8, stage_scores, cond = _deblock_and_recondition(
                    canvas_u8, valid_hw, is_jpeg_f, scores, cond
                )
            if use_deblur:
                canvas_u8, cond = _deblur_and_recondition(
                    canvas_u8, valid_hw, is_jpeg_f, stage_scores, cond
                )
            x = canvas_u8.astype(dtype) / dtype(255.0)
            out = family.apply(
                params, x, cond.astype(dtype), key, cfg,
                apply_fn=folded.apply if use_folded else None,
            )
            out_u8 = jnp.clip(jnp.round(out.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.uint8)
            return out_u8, scores

        return jax.jit(diffusion_program)

    backbone = folded.apply if use_folded else family.apply
    # space-to-depth IO (config.py s2d_io): convert + normalize AFTER the
    # u8 space-to-depth permutation and quantize BEFORE the u8 depth-to-
    # space, so the program carries no full-res bf16 [N,H,W,3] tensor
    # (3/128 lane utilization; ~2 ms/step of copies at 512px b8).
    # Value-exact: s2d is a permutation, the backbone consumes the same
    # values, and the residual channel order matches (models/unet.py);
    # f32 byte-identical, bf16 <=1 level (tests/test_engine_s2d_io.py)
    s2d_scale = getattr(cfg, "input_scale", 1)

    def program(params, canvas_u8, valid_hw, is_jpeg_f):
        scores, cond = batch_classify_and_condition(
            canvas_u8.astype(jnp.float32), valid_hw, is_jpeg_f
        )
        stage_scores = scores
        if use_deblock:
            canvas_u8, stage_scores, cond = _deblock_and_recondition(
                canvas_u8, valid_hw, is_jpeg_f, scores, cond
            )
        if use_deblur:
            canvas_u8, cond = _deblur_and_recondition(
                canvas_u8, valid_hw, is_jpeg_f, stage_scores, cond
            )
        if use_s2d_io:
            x = mnn.space_to_depth(canvas_u8, s2d_scale).astype(dtype) / dtype(255.0)
            out = backbone(params, x, cond.astype(dtype), config=cfg, s2d_io=True)
            if egress == "yuv420":
                return to_yuv420_s2d(out), scores
            out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
            out_u8 = jnp.round(out * 255.0).astype(jnp.uint8)
            return mnn.pixel_shuffle(out_u8, s2d_scale), scores
        x = canvas_u8.astype(dtype) / dtype(255.0)
        out = backbone(params, x, cond.astype(dtype), config=cfg)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        if egress == "yuv420":
            return jax.vmap(to_yuv420)(out * 255.0), scores
        return jnp.round(out * 255.0).astype(jnp.uint8), scores

    return jax.jit(program)
