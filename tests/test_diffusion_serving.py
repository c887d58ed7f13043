"""Diffusion restoration family through the serving engine."""

import numpy as np
import pytest

from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.models import diffusion, register, ModelFamily
from image_restoration_platform_tpu.serve import RestorationEngine, RestoratorService

import fixtures


@pytest.fixture(scope="module")
def engine():
    # a tiny diffusion config so CPU compile stays fast
    cfg = diffusion.DiffusionConfig(
        sample_steps=2,
        strength=0.3,
        unet=type(diffusion.DiffusionConfig().unet)(
            in_channels=6, base_channels=32, channel_mults=(1, 2), blocks_per_level=1,
            attn_heads=2, time_conditioned=True,
        ),
    )
    register(ModelFamily("diffusion-restore", diffusion.init, diffusion.restore, cfg))
    try:
        yield RestorationEngine(serving_config=ServingConfig(size_buckets=(32,), max_batch=2))
    finally:
        # restore the default registration for other modules
        register(
            ModelFamily(
                "diffusion-restore", diffusion.init, diffusion.restore, diffusion.DiffusionConfig()
            )
        )


def test_diffusion_restore_batch(engine):
    canvas = np.full((1, 32, 32, 3), 128, dtype=np.uint8)
    out, scores, meta = engine.restore_batch(canvas, family_name="diffusion-restore")
    assert out.shape == (1, 32, 32, 3)
    assert scores.shape == (1, 7)
    assert out.dtype == np.uint8


def test_diffusion_is_stochastic_but_bounded(engine):
    canvas = np.full((1, 32, 32, 3), 100, dtype=np.uint8)
    out1, _, _ = engine.restore_batch(canvas, family_name="diffusion-restore")
    out2, _, _ = engine.restore_batch(canvas, family_name="diffusion-restore")
    # different rng keys per call -> different noise paths
    assert not np.array_equal(out1, out2)
    # but SDEdit strength 0.3 keeps content: outputs stay near the input
    assert np.abs(out1.astype(int) - 100).mean() < 80


def test_diffusion_through_restorator(engine):
    svc = RestoratorService(engine=engine, serving_config=engine.config)
    result = svc.restore(
        fixtures.create_clean_image((32, 32)), options={"model": "diffusion-restore"}
    )
    assert result["success"] is True
    assert result["metadata"]["model"] == "diffusion-restore"
