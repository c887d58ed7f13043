"""Multi-device serving: the engine's mesh path on the virtual 8-device mesh."""

import numpy as np
import pytest

from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.parallel import make_mesh
from image_restoration_platform_tpu.serve import RestorationEngine


@pytest.fixture(scope="module")
def mesh_engine(cpu_devices):
    mesh = make_mesh(data=4, tensor=2, spatial=1)
    return RestorationEngine(
        mesh=mesh, serving_config=ServingConfig(size_buckets=(32,), max_batch=8)
    )


def test_mesh_restore_batch(mesh_engine):
    canvas = np.random.default_rng(0).integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    out, scores, meta = mesh_engine.restore_batch(canvas, family_name="restore-unet-small")
    assert out.shape == (8, 32, 32, 3)
    assert scores.shape == (8, 7)
    assert meta["batchBucket"] >= 4  # padded at least to the data-axis size


def test_mesh_pads_small_batches_to_data_axis(mesh_engine):
    canvas = np.random.default_rng(1).integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    out, scores, meta = mesh_engine.restore_batch(canvas, family_name="restore-unet-small")
    assert out.shape == (1, 32, 32, 3)
    assert meta["batchBucket"] == 4  # data axis = 4 shards minimum


def test_mesh_matches_single_device(mesh_engine):
    """DP x TP sharded execution must match the unsharded result."""
    canvas = np.random.default_rng(2).integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    single = RestorationEngine(serving_config=mesh_engine.config)
    out_m, scores_m, _ = mesh_engine.restore_batch(canvas, family_name="restore-unet-small")
    out_s, scores_s, _ = single.restore_batch(canvas, family_name="restore-unet-small")
    np.testing.assert_allclose(scores_m, scores_s, atol=1e-4)
    # bf16 compute with different collective orders: allow small byte jitter
    assert np.mean(np.abs(out_m.astype(int) - out_s.astype(int))) < 1.0
