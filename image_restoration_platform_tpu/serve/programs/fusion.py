"""Multi-image fusion program: restore K aligned exposures and composite
them in ONE device launch (BASELINE.json config 4; reference accepts <=3
images per call, image-restoration-platform.md:104)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models import get_family


def build_fusion_program(family_name: str, *, dtype, use_folded: bool):
    """Jittable ``fn(params, canvas [K,B,B,3] u8, valid_hw, is_jpeg_f)`` ->
    (fused [B,B,3] u8, scores [K,7]).

    Each image is classified and restored (shared fused backbone), then
    blended with per-image weights derived from its degradation scores:
    cleaner inputs (low blur/noise/lowLight) dominate the composite."""
    from ...classify.fused import batch_classify_and_condition

    family = get_family(family_name)
    cfg = family.config
    if use_folded:
        from ...models import folded

        backbone = folded.apply
    else:
        backbone = family.apply

    def program(params, canvas, vhw, jpeg_f):
        scores, cond = batch_classify_and_condition(
            canvas.astype(jnp.float32), vhw, jpeg_f
        )
        x = canvas.astype(dtype) / dtype(255.0)
        restored = backbone(params, x, cond.astype(dtype), config=cfg)
        restored = jnp.clip(restored.astype(jnp.float32), 0.0, 1.0)
        # quality weighting: blur/noise/lowLight degrade alignment-free
        # fusion the most; softmax sharpens the preference
        quality = 1.0 - (scores[:, 0] + scores[:, 1] + scores[:, 2]) / 3.0
        weights = jax.nn.softmax(4.0 * quality)
        fused = jnp.einsum("k,khwc->hwc", weights, restored)
        fused_u8 = jnp.round(jnp.clip(fused, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return fused_u8, scores

    return jax.jit(program)
