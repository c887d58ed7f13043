"""Out-of-distribution quality gates on the SHIPPED flagship weights
(VERDICT r2 missing #2 / next #4): generator- and physics-disjoint
degradations (train/ood.py) through the serving inference path.

Thresholds are calibrated with margin against the round-3 weights (see
BASELINE.md round-3 quality table); they gate REGRESSIONS, not aspirations:
the strong classes must stay strongly positive, no class may be actively
damaged, and clean OOD content must pass near-identity (the catastrophic
+80/255 dark-image brightening and the -5.7 dB texture destruction of the
round-2 weights are what these pin down).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_platform_tpu.classify.fused import batch_classify_and_condition
from image_restoration_platform_tpu.models import get_family
from image_restoration_platform_tpu.models import weights as W
from image_restoration_platform_tpu.train.ood import OOD_DEGRADATIONS, ood_clean, ood_eval_batch


def _psnr(a, b):
    mse = float(np.mean(np.square(np.asarray(a, np.float32) - np.asarray(b, np.float32))))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


@pytest.fixture(scope="module")
def serve():
    path = W.weights_path("restore-unet")
    if not os.path.exists(path):
        pytest.skip("no shipped flagship weights")
    family = get_family("restore-unet")
    template = family.init(jax.random.PRNGKey(0), family.config)
    params = W.load_params(template, path)

    from image_restoration_platform_tpu.ops.deblock import deblock_and_recondition
    from image_restoration_platform_tpu.ops.deblur import deblur_and_recondition

    @jax.jit
    def fn(degraded):
        # mirror the engine's fused program (serve/engine.py:_build_program):
        # u8 canvas -> classify -> deblock -> spectral deblur -> re-condition
        # -> backbone
        n, s = degraded.shape[0], degraded.shape[1]
        valid = jnp.tile(jnp.asarray([[s, s]], jnp.int32), (n, 1))
        is_jpeg = jnp.ones((n,), jnp.float32)
        canvas_u8 = jnp.clip(jnp.round(degraded * 255.0), 0, 255).astype(jnp.uint8)
        scores, cond = batch_classify_and_condition(
            canvas_u8.astype(jnp.float32), valid, is_jpeg
        )
        canvas_u8, scores, cond = deblock_and_recondition(
            canvas_u8, valid, is_jpeg, scores, cond
        )
        canvas_u8, cond = deblur_and_recondition(canvas_u8, valid, is_jpeg, scores, cond)
        pred = family.apply(
            params,
            canvas_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0),
            cond.astype(jnp.bfloat16),
            config=family.config,
        )
        return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

    return fn


# per-class minimum gain (dB): strong classes gate high; mild-blur classes
# gate at "no active damage" (their OOD inputs sit at ~25 dB with little
# recoverable headroom — see scripts/eval_ood.py output in BASELINE.md)
_GATES = {
    # re-pinned 2026-08-20 after the identity-anchor promotion (comp-only
    # rows anchored to the input, TrainConfig.anchor_comp): every axis
    # improved or held, so the floors rise to ~0.3-1 dB under the measured
    # values (stage-inclusive fixture measurements in the gate comments)
    "poisson_gaussian": 4.5,  # measured +5.45
    "defocus": -0.5,  # measured -0.04 raw; 8-bit disk channel stays off
    "motion": 0.0,  # spectral deblur stage (ops/deblur.py): was -1.5
    "jpeg_q10_60": -0.5,  # measured -0.15 with deblock (was -0.45 pre-anchor)
    "vignette_low_light": 11.0,  # measured +12.85
    "chained": 2.5,  # measured +3.38
}


@pytest.mark.parametrize("name", sorted(_GATES))
def test_flagship_ood_gain(serve, name):
    degraded, clean = ood_eval_batch(2026, 8, 128, name)
    pred = np.asarray(serve(jnp.asarray(degraded)))
    gain = _psnr(pred, clean) - _psnr(degraded, clean)
    assert gain > _GATES[name], f"{name}: OOD gain {gain:.2f} dB below gate {_GATES[name]}"


def test_flagship_motion_deblur_gain(serve):
    """VERDICT r3 item 4 target: the motion class must show a real recovery
    capability, >= +1.0 dB MEAN PER-IMAGE gain (the aggregate-PSNR gate above
    is mse-weighted, so one hard image drowns the fired images' +5..+7 dB;
    per-image mean is the honest capability measure)."""
    degraded, clean = ood_eval_batch(2026, 8, 128, "motion")
    pred = np.asarray(serve(jnp.asarray(degraded)))
    per_image = [
        _psnr(pred[i], clean[i]) - _psnr(degraded[i], clean[i])
        for i in range(pred.shape[0])
    ]
    mean_gain = float(np.mean(per_image))
    assert mean_gain >= 1.0, f"motion per-image mean gain {mean_gain:.2f} dB < 1.0"


def test_flagship_ood_clean_no_harm(serve):
    """Near-identity on clean OOD content, in aggregate AND per image —
    aggregates hid the +80/255 dark-image outlier."""
    rng = np.random.default_rng(2027)
    clean = ood_clean(rng, 8, 128)
    pred = np.asarray(serve(jnp.asarray(clean)))
    per_mad = np.mean(np.abs(pred - clean), axis=(1, 2, 3)) * 255.0
    assert per_mad.mean() < 4.0, f"mean OOD clean harm {per_mad.mean():.2f}/255"
    assert per_mad.max() < 16.0, f"worst OOD clean harm {per_mad.max():.2f}/255"
