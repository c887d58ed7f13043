"""Prompt enhancer contract tests, ported from
/root/reference/server-node/tests/promptEnhancerService.test.js:16-58."""

import numpy as np
import pytest

from image_restoration_platform_tpu.prompt import (
    PromptEnhancerService,
    conditioning_vector,
    COND_DIM,
)

BASE = {
    "blur": 0.1,
    "noise": 0.1,
    "lowLight": 0.1,
    "compression": 0.1,
    "scratch": 0.1,
    "fade": 0.1,
    "colorShift": 0.1,
}


def test_prioritizes_top_issues_and_tailors_instructions():
    service = PromptEnhancerService()
    degradation = {**BASE, "blur": 0.82, "noise": 0.81, "colorShift": 0.76, "fade": 0.55}

    enhanced = service.enhance(degradation, "Repair and restore the family portrait")

    assert "reduce severe motion blur" in enhanced
    assert "aggressively suppress grain" in enhanced
    assert "correct severe color cast" in enhanced
    assert "Repair and restore the family portrait" in enhanced
    # fade (4th issue) must NOT be included — top-3 only
    assert "enhance color vibrancy" not in enhanced


def test_defaults_to_subtle_enhancements():
    service = PromptEnhancerService()
    enhanced = service.enhance(dict(BASE))
    assert "Quality guidelines" in enhanced
    assert "subtle enhancements only" in enhanced


def test_truncates_long_prompts():
    service = PromptEnhancerService()
    degradation = {**BASE, "blur": 0.9}
    enhanced = service.enhance(degradation, "enhance " * 300)
    assert len(enhanced) <= 1000
    assert "User request:" in enhanced
    assert enhanced.endswith("...")


def test_severity_boundaries():
    service = PromptEnhancerService()
    # 0.5 -> medium, 0.7 -> high, 0.31 -> low
    assert "reduce motion blur and improve focus clarity" in service.enhance({**BASE, "blur": 0.5})
    assert "reduce severe motion blur" in service.enhance({**BASE, "blur": 0.7})
    assert "slightly enhance sharpness" in service.enhance({**BASE, "blur": 0.31})


def test_high_severity_note():
    service = PromptEnhancerService()
    enhanced = service.enhance({**BASE, "scratch": 0.95})
    assert "significant restoration work" in enhanced


def test_validate_degradation():
    PromptEnhancerService.validate_degradation(dict(BASE))
    with pytest.raises(ValueError):
        PromptEnhancerService.validate_degradation({**BASE, "blur": 1.5})
    missing = dict(BASE)
    missing.pop("fade")
    with pytest.raises(ValueError):
        PromptEnhancerService.validate_degradation(missing)


def test_conditioning_vector_layout():
    vec = conditioning_vector({**BASE, "blur": 0.82, "noise": 0.55})
    assert vec.shape == (COND_DIM,)
    assert vec.dtype == np.float32
    # raw scores occupy the first 7 slots (blur is index 0)
    assert vec[0] == np.float32(0.82)
    # blur(high) one-hot: offset 7 + 0*3 + 2
    assert vec[7 + 2] == np.float32(0.82)
    # noise(medium): offset 7 + 1*3 + 1
    assert vec[7 + 3 + 1] == np.float32(0.55)
    # unselected types contribute nothing to the one-hot region
    assert np.count_nonzero(vec[7:]) == 2
