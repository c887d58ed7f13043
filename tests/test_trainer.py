"""Trainer unit tests: losses, data pipeline, warm start, SR/diffusion modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_platform_tpu.models import weights as W, get_family
from image_restoration_platform_tpu.train import DataConfig, Trainer, TrainConfig, synthetic_batch
from image_restoration_platform_tpu.train.trainer import charbonnier, gradient_loss


class TestLosses:
    def test_charbonnier_at_zero(self):
        x = jnp.zeros((2, 4, 4, 3))
        assert float(charbonnier(x, x, 1e-3)) == pytest.approx(1e-3, rel=1e-3)

    def test_charbonnier_monotone(self):
        target = jnp.zeros((2, 4, 4, 3))
        small = float(charbonnier(target + 0.1, target, 1e-3))
        large = float(charbonnier(target + 0.5, target, 1e-3))
        assert large > small

    def test_gradient_loss_flat_vs_edge(self):
        flat = jnp.zeros((1, 8, 8, 3))
        edge = flat.at[:, :, 4:].set(1.0)
        assert float(gradient_loss(flat, flat)) == 0.0
        assert float(gradient_loss(edge, flat)) > 0.0


class TestSyntheticData:
    def test_shapes_and_ranges(self):
        degraded, clean, cond = synthetic_batch(jax.random.PRNGKey(0), 4, DataConfig(size=32))
        assert degraded.shape == (4, 32, 32, 3)
        assert clean.shape == (4, 32, 32, 3)
        assert cond.shape == (4, 28)
        assert float(jnp.min(degraded)) >= 0.0 and float(jnp.max(degraded)) <= 1.0
        assert float(jnp.min(clean)) >= 0.0 and float(jnp.max(clean)) <= 1.0

    def test_deterministic_given_key(self):
        a = synthetic_batch(jax.random.PRNGKey(7), 2, DataConfig(size=32))
        b = synthetic_batch(jax.random.PRNGKey(7), 2, DataConfig(size=32))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))

    def test_degradation_actually_degrades(self):
        degraded, clean, _ = synthetic_batch(jax.random.PRNGKey(3), 8, DataConfig(size=32))
        mse = float(jnp.mean(jnp.square(degraded - clean)))
        assert mse > 1e-4


class TestTrainerModes:
    def test_loss_decreases_smoke(self):
        tr = Trainer(TrainConfig(family="restore-unet-small", batch_size=4, image_size=32, total_steps=100))
        losses = tr.run(8, log_every=7)
        assert all(np.isfinite(losses))

    def test_sr_mode_runs(self):
        tr = Trainer(TrainConfig(family="sr-x2", batch_size=4, image_size=32, total_steps=50))
        losses = tr.run(2, log_every=1)
        assert all(np.isfinite(losses))

    def test_warm_start_loads_weights(self, tmp_path, monkeypatch):
        family = get_family("restore-unet-small")
        params = family.init(jax.random.PRNGKey(0), family.config)
        params["stem"]["b"] = params["stem"]["b"] + 3.0
        monkeypatch.setenv("IRP_WEIGHTS_DIR", str(tmp_path))
        W.save_params(params, str(tmp_path / "restore-unet-small.npz"))

        tr = Trainer(
            TrainConfig(family="restore-unet-small", batch_size=2, image_size=32, total_steps=10),
            warm_start=True,
        )
        np.testing.assert_allclose(np.asarray(tr.state[0]["stem"]["b"]), 3.0, atol=1e-2)
