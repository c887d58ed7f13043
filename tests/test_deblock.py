"""JPEG deblocking stage (ops/deblock.py): quant-step estimator behavior,
jax-vs-numpy-reference parity, bit-identical passthrough, and the e2e gate
interaction with the fused serving program.

The stage exists because the learned backbone is net-negative on
compression-dominant inputs (the jpeg axis is the reference product's most
common real-photo damage, `image-restoration-platform.md:1140`); these tests
pin the estimator's firing contract (fires on real libjpeg round-trips,
never on clean/noisy/blurred content) and the shrinkage's exactness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_restoration_platform_tpu.ops.deblock import (
    LAM_MIN_FIRE,
    deblock_and_recondition,
    deblock_canvas_batch,
    deblock_lambda,
    deblock_reference,
)

def _photo(seed: int, size: int = 128) -> np.ndarray:
    """Deterministic smooth-ish synthetic photo in [0,1] with edges + texture
    (enough AC structure that the quant estimator has coefficients to see)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack(
        [
            0.45 + 0.35 * np.sin(6.3 * (xx * f1 + yy * f2))
            for f1, f2 in ((1.0, 0.4), (0.6, 1.3), (0.2, 0.9))
        ],
        axis=-1,
    )
    img += 0.25 * (yy[..., None] > 0.5)  # a hard edge
    img += rng.normal(0.0, 0.02, img.shape).astype(np.float32)  # fine texture
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _jpeg_roundtrip(img01: np.ndarray, quality: int) -> np.ndarray:
    from image_restoration_platform_tpu import imageio

    u8 = np.clip(np.round(img01 * 255.0), 0, 255).astype(np.uint8)
    dec = imageio.decode_image(imageio.encode_jpeg(u8, quality=quality))
    return dec.pixels.astype(np.float32) / 255.0


def _lam(img01: np.ndarray) -> float:
    x = jnp.asarray(img01[None] * 255.0, jnp.float32)
    valid = jnp.asarray([[img01.shape[0], img01.shape[1]]], jnp.int32)
    return float(deblock_lambda(x, valid)[0])


class TestEstimator:
    def test_fires_on_low_quality_jpeg(self):
        img = _jpeg_roundtrip(_photo(0), quality=20)
        assert _lam(img) > LAM_MIN_FIRE

    def test_fires_across_quality_range(self):
        for q in (10, 25, 40, 60):
            img = _jpeg_roundtrip(_photo(q), quality=q)
            assert _lam(img) > LAM_MIN_FIRE, f"q={q}"

    def test_silent_on_clean(self):
        assert _lam(_photo(1)) <= LAM_MIN_FIRE

    def test_silent_on_noisy(self):
        rng = np.random.default_rng(7)
        img = np.clip(_photo(2) + rng.normal(0, 0.08, (128, 128, 3)), 0, 1)
        assert _lam(img.astype(np.float32)) <= LAM_MIN_FIRE

    def test_silent_on_high_quality_jpeg(self):
        # q85 (the preprocess re-encode quality) must not trigger the stage:
        # its quant steps are ~2-3, lambda ~0.5 — the backbone handles it
        img = _jpeg_roundtrip(_photo(3), quality=85)
        assert _lam(img) <= LAM_MIN_FIRE

    def test_respects_valid_region(self):
        # letterboxed canvas: jpeg content in the valid window, zeros outside.
        # The estimator must read only valid-interior blocks.
        img = _jpeg_roundtrip(_photo(4), quality=15)
        canvas = np.zeros((192, 192, 3), np.float32)
        canvas[:128, :128] = img
        x = jnp.asarray(canvas[None] * 255.0, jnp.float32)
        lam_full = deblock_lambda(x, jnp.asarray([[128, 128]], jnp.int32))[0]
        assert float(lam_full) > LAM_MIN_FIRE


class TestShrinkage:
    def test_matches_numpy_reference_on_fire(self):
        img = _jpeg_roundtrip(_photo(5), quality=20)
        ref, lam_ref, fired_ref = deblock_reference(img)
        assert fired_ref

        canvas = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)[None]
        valid = jnp.asarray([[128, 128]], jnp.int32)
        out, fire = deblock_canvas_batch(jnp.asarray(canvas), valid)
        assert bool(fire[0])
        got = np.asarray(out[0], np.float32) / 255.0
        # f32 jax vs f64 numpy + one u8 rounding: within 1 byte everywhere
        assert np.max(np.abs(got - ref)) <= (1.5 / 255.0)
        assert abs(_lam(img) - lam_ref) < 1e-3

    def test_passthrough_is_bit_identical(self):
        img = _photo(6)
        canvas = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)[None]
        valid = jnp.asarray([[128, 128]], jnp.int32)
        out, fire = deblock_canvas_batch(jnp.asarray(canvas), valid)
        assert not bool(fire[0])
        assert np.array_equal(np.asarray(out), canvas)

    def test_mixed_batch_fires_per_image(self):
        clean = _photo(7)
        jpg = _jpeg_roundtrip(_photo(8), quality=15)
        canvas = np.stack(
            [
                np.clip(np.round(clean * 255.0), 0, 255).astype(np.uint8),
                np.clip(np.round(jpg * 255.0), 0, 255).astype(np.uint8),
            ]
        )
        valid = jnp.asarray([[128, 128], [128, 128]], jnp.int32)
        out, fire = deblock_canvas_batch(jnp.asarray(canvas), valid)
        assert list(np.asarray(fire)) == [False, True]
        assert np.array_equal(np.asarray(out[0]), canvas[0])  # untouched
        assert not np.array_equal(np.asarray(out[1]), canvas[1])

    def test_improves_psnr_vs_clean(self):
        clean = _photo(9)
        jpg = _jpeg_roundtrip(clean, quality=15)
        out, lam, fired = deblock_reference(jpg)
        assert fired

        def psnr(a, b):
            return 10 * np.log10(1.0 / max(float(np.mean((a - b) ** 2)), 1e-10))

        assert psnr(out, clean) > psnr(jpg, clean) + 0.1

    def test_tiny_canvas_passthrough(self):
        canvas = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3), np.uint8)
        out, fire = deblock_canvas_batch(
            jnp.asarray(canvas), jnp.asarray([[32, 32]], jnp.int32)
        )
        assert np.array_equal(np.asarray(out), canvas) and not bool(fire[0])


class TestRecondition:
    def test_no_fire_returns_inputs_unchanged(self):
        from image_restoration_platform_tpu.classify.fused import (
            batch_classify_and_condition,
        )

        img = _photo(10)
        canvas = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)[None]
        valid = jnp.asarray([[128, 128]], jnp.int32)
        is_jpeg = jnp.ones((1,), jnp.float32)
        scores, cond = batch_classify_and_condition(
            jnp.asarray(canvas, jnp.float32), valid, is_jpeg
        )
        out, s2, c2 = deblock_and_recondition(
            jnp.asarray(canvas), valid, is_jpeg, scores, cond
        )
        assert np.array_equal(np.asarray(out), canvas)
        assert np.array_equal(np.asarray(s2), np.asarray(scores))
        assert np.array_equal(np.asarray(c2), np.asarray(cond))

    def test_fire_keeps_photometric_scores(self):
        from image_restoration_platform_tpu.classify.fused import (
            batch_classify_and_condition,
        )

        jpg = _jpeg_roundtrip(_photo(11), quality=15)
        canvas = np.clip(np.round(jpg * 255.0), 0, 255).astype(np.uint8)[None]
        valid = jnp.asarray([[128, 128]], jnp.int32)
        is_jpeg = jnp.ones((1,), jnp.float32)
        scores, cond = batch_classify_and_condition(
            jnp.asarray(canvas, jnp.float32), valid, is_jpeg
        )
        out, s2, _ = deblock_and_recondition(
            jnp.asarray(canvas), valid, is_jpeg, scores, cond
        )
        assert not np.array_equal(np.asarray(out), canvas)  # fired
        # photometric rows (lowLight=2, fade=5, colorShift=6) keep originals
        for idx in (2, 5, 6):
            assert float(s2[0, idx]) == pytest.approx(float(scores[0, idx]), abs=1e-6)
