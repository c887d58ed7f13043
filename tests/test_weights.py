"""Serving-weights format and registry auto-loading."""

import os

import jax
import numpy as np
import pytest

from image_restoration_platform_tpu.models import ParamCache, get_family
from image_restoration_platform_tpu.models import weights as W


@pytest.fixture
def family():
    return get_family("restore-unet-small")


def test_roundtrip_preserves_structure(family, tmp_path):
    params = family.init(jax.random.PRNGKey(0), family.config)
    path = str(tmp_path / "m.npz")
    W.save_params(params, path)
    template = family.init(jax.random.PRNGKey(1), family.config)
    restored = W.load_params(template, path)

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert a.shape == np.asarray(b).shape
        # fp16 storage for >=2D float leaves
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_param_cache_loads_weights_dir(family, tmp_path, monkeypatch):
    params = family.init(jax.random.PRNGKey(0), family.config)
    # perturb a recognisable leaf so loading is observable
    params["stem"]["b"] = params["stem"]["b"] + 7.0
    W.save_params(params, str(tmp_path / "restore-unet-small.npz"))

    monkeypatch.setenv("IRP_WEIGHTS_DIR", str(tmp_path))
    cache = ParamCache(seed=123)
    loaded = cache.get("restore-unet-small")
    np.testing.assert_allclose(np.asarray(loaded["stem"]["b"]), 7.0, atol=1e-2)


def test_param_cache_without_weights_uses_init(tmp_path, monkeypatch):
    monkeypatch.setenv("IRP_WEIGHTS_DIR", str(tmp_path / "empty"))
    cache = ParamCache(seed=0)
    params = cache.get("restore-unet-small")
    np.testing.assert_allclose(np.asarray(params["stem"]["b"]), 0.0)


def test_shipped_flagship_weights_exist_and_load():
    """The repo ships trained restore-unet weights; they must parse."""
    path = W.weights_path("restore-unet")
    if not os.path.exists(path):
        pytest.skip("no shipped weights in this checkout")
    family = get_family("restore-unet")
    template = family.init(jax.random.PRNGKey(0), family.config)
    params = W.load_params(template, path)
    # trained head must be non-zero (zero-init would mean identity model)
    assert float(np.abs(np.asarray(params["head"]["w"])).max()) > 0
