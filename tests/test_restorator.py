"""Restorator workflow tests, ported from
/root/reference/server-node/tests/restoratorService.test.js:18-78, running the
real on-device pipeline with the small model family."""

import base64

import numpy as np
import pytest

import fixtures
from image_restoration_platform_tpu import imageio
from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.serve import RestorationEngine, RestoratorService


@pytest.fixture(scope="module")
def service():
    cfg = ServingConfig(size_buckets=(64,), max_batch=4)
    engine = RestorationEngine(serving_config=cfg)
    return RestoratorService(engine=engine, serving_config=cfg)


def test_full_workflow_result_shape(service):
    image = fixtures.create_dark_image(size=(48, 40))
    result = service.restore(
        image, user_prompt="restore this photo", user_context={"userId": "u1"},
        options={"model": "restore-unet-small"},
    )

    assert result["success"] is True
    # timings contract (restorator.js:106-121)
    for key in ("classify_ms", "prompt_ms", "restore_ms", "total_ms"):
        assert key in result["timings"]
    assert result["timings"]["total_ms"] >= result["timings"]["restore_ms"]

    # degradation analysis present with all seven scores
    assert set(result["degradationAnalysis"].keys()) == {
        "blur", "noise", "lowLight", "compression", "scratch", "fade", "colorShift",
    }
    # the dark fixture must drive lowLight into the prompt
    assert "brighten" in result["enhancedPrompt"] or "brightness" in result["enhancedPrompt"]
    assert "restore this photo" in result["enhancedPrompt"]

    # metadata contract
    meta = result["metadata"]
    assert meta["providerRequestId"]
    assert meta["deviceSeconds"] > 0
    assert meta["processingTime"] == result["timings"]["total_ms"]
    issue_types = {i["type"] for i in meta["classificationIssues"]}
    assert "lowLight" in issue_types

    # restored image round-trips and matches input dimensions
    restored = imageio.decode_image(base64.b64decode(result["restoredImage"]))
    assert (restored.height, restored.width) == (48, 40)


def test_failure_is_structured(service):
    result = service.restore(b"not an image", user_context={"userId": "u1"})
    assert result["success"] is False
    assert result["error"]["type"] == "INVALID_INPUT"
    assert result["metadata"]["failureStage"] == "CLASSIFICATION"
    assert "total_ms" in result["timings"]


def test_batch_isolates_failures(service):
    good = fixtures.create_clean_image(size=(32, 32))
    results = service.restore_batch(
        [good, b"corrupt", good], options={"model": "restore-unet-small"}
    )
    assert [r["success"] for r in results] == [True, False, True]
    assert results[1]["error"]["type"] == "INVALID_INPUT"


def test_array_input(service):
    img = np.full((40, 40, 3), 200, dtype=np.uint8)
    result = service.restore(img, options={"model": "restore-unet-small"})
    assert result["success"] is True


def test_health_status(service):
    health = service.get_health_status()
    assert health["healthy"] is True
    assert health["services"]["classifier"] is True
