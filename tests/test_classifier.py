"""Classifier contract tests, ported from the reference suite
(/root/reference/server-node/tests/classifierService.test.js:19-57)."""

import numpy as np
import pytest

import fixtures
from image_restoration_platform_tpu.classify import (
    ClassifierService,
    classify_scores,
    DEGRADATION_ORDER,
)


@pytest.fixture(scope="module")
def service():
    return ClassifierService()


def test_detects_motion_blur(service):
    result = service.analyze(fixtures.create_blurred_image())
    assert result["blur"] > 0.2
    assert result["noise"] >= 0
    assert "colorShift" in result


def test_detects_strong_noise(service):
    result = service.analyze(fixtures.create_noisy_image())
    assert result["noise"] > 0.3


def test_detects_low_light(service):
    result = service.analyze(fixtures.create_dark_image())
    assert result["lowLight"] > 0.3


def test_detects_color_cast(service):
    result = service.analyze(fixtures.create_color_shifted_image())
    assert result["colorShift"] > 0.25


def test_clean_image_scores_normalized(service):
    result = service.analyze(fixtures.create_clean_image())
    for value in result.values():
        assert 0.0 <= value <= 1.0


def test_all_seven_types_present(service):
    result = service.analyze(fixtures.create_clean_image())
    assert set(result.keys()) == set(DEGRADATION_ORDER)


def test_compression_zero_for_png(service):
    result = service.analyze(fixtures.create_png_image())
    assert result["compression"] == 0.0


def test_grayscale_input_handled(service):
    gray = np.full((64, 64), 128, dtype=np.uint8)
    result = service.analyze_array(gray, "png")
    assert set(result.keys()) == set(DEGRADATION_ORDER)
    for value in result.values():
        assert 0.0 <= value <= 1.0


def test_single_fused_program_matches_service(service):
    """classify_scores (jitted) and the service facade agree."""
    img_bytes = fixtures.create_color_shifted_image()
    from image_restoration_platform_tpu import imageio

    decoded = imageio.decode_image(img_bytes)
    device = classify_scores(decoded.pixels, True)
    svc = service.analyze(img_bytes)
    for key in DEGRADATION_ORDER:
        assert abs(float(device[key]) - svc[key]) < 1e-5
