"""Fused-path parity: masked classification and device conditioning must match
the reference-contract host implementations exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

import fixtures
from image_restoration_platform_tpu import imageio
from image_restoration_platform_tpu.classify import classify_scores, DEGRADATION_ORDER
from image_restoration_platform_tpu.classify.fused import (
    batch_classify_and_condition,
    conditioning_from_scores,
    masked_classify_scores,
)
from image_restoration_platform_tpu.prompt import conditioning_vector


def _scores_dict(vec):
    return {k: float(v) for k, v in zip(DEGRADATION_ORDER, vec)}


class TestMaskedClassify:
    def test_full_valid_region_matches_unmasked(self):
        for maker, fmt in [
            (fixtures.create_dark_image, "jpeg"),
            (fixtures.create_noisy_image, "jpeg"),
            (fixtures.create_color_shifted_image, "jpeg"),
        ]:
            img = imageio.decode_image(maker((64, 64))).pixels
            ref = classify_scores(img, True)
            masked = masked_classify_scores(
                jnp.asarray(img, jnp.float32),
                jnp.asarray(64),
                jnp.asarray(64),
                jnp.asarray(1.0),
            )
            for i, key in enumerate(DEGRADATION_ORDER):
                assert abs(float(masked[i]) - float(ref[key])) < 1e-3, key

    def test_padding_is_ignored(self):
        """Scores of a letterboxed canvas must match the unpadded image."""
        img = imageio.decode_image(fixtures.create_dark_image((48, 40))).pixels
        canvas = np.pad(img, ((0, 16), (0, 24), (0, 0)), mode="edge")
        ref = classify_scores(img, True)
        masked = masked_classify_scores(
            jnp.asarray(canvas, jnp.float32),
            jnp.asarray(48),
            jnp.asarray(40),
            jnp.asarray(1.0),
        )
        for i, key in enumerate(DEGRADATION_ORDER):
            # convolution rows at the crop boundary see replicated pixels, so
            # allow a small tolerance on stencil-derived scores
            assert abs(float(masked[i]) - float(ref[key])) < 0.05, key

    def test_jpeg_gate(self):
        img = imageio.decode_image(fixtures.create_compressed_image((64, 64))).pixels
        on = masked_classify_scores(
            jnp.asarray(img, jnp.float32), jnp.asarray(64), jnp.asarray(64), jnp.asarray(1.0)
        )
        off = masked_classify_scores(
            jnp.asarray(img, jnp.float32), jnp.asarray(64), jnp.asarray(64), jnp.asarray(0.0)
        )
        idx = DEGRADATION_ORDER.index("compression")
        assert float(off[idx]) == 0.0
        assert float(on[idx]) >= 0.0


class TestDeviceConditioning:
    @pytest.mark.parametrize(
        "scores",
        [
            {"blur": 0.82, "noise": 0.81, "colorShift": 0.76, "fade": 0.55},
            {"blur": 0.31},
            {},
            {"blur": 0.5, "noise": 0.7, "lowLight": 0.69, "scratch": 0.35},
            {"blur": 1.0, "noise": 1.0, "lowLight": 1.0, "compression": 1.0},
        ],
    )
    def test_matches_host_conditioning(self, scores):
        base = {k: 0.1 for k in DEGRADATION_ORDER}
        degradation = {**base, **scores}
        host = conditioning_vector(degradation)
        device = np.asarray(
            conditioning_from_scores(
                jnp.asarray([degradation[k] for k in DEGRADATION_ORDER], jnp.float32)
            )
        )
        np.testing.assert_allclose(device, host, atol=1e-6)

    def test_batch_api(self):
        canvas = np.random.default_rng(0).integers(0, 256, (3, 32, 32, 3)).astype(np.float32)
        valid = np.asarray([[32, 32], [20, 24], [8, 8]], np.int32)
        jpeg = np.asarray([1.0, 0.0, 1.0], np.float32)
        scores, cond = batch_classify_and_condition(jnp.asarray(canvas), jnp.asarray(valid), jnp.asarray(jpeg))
        assert scores.shape == (3, 7)
        assert cond.shape == (3, 28)
        dicts = [_scores_dict(s) for s in np.asarray(scores)]
        for d in dicts:
            for v in d.values():
                assert 0.0 <= v <= 1.0
