"""GPipe-style pipeline parallelism over the pipe mesh axis: exactness vs the
unpipelined SRNet forward on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_platform_tpu.models import srnet
from image_restoration_platform_tpu.parallel import make_mesh
from image_restoration_platform_tpu.parallel.pipeline import srnet_pipeline_apply


@pytest.fixture(scope="module")
def setup(cpu_devices):
    cfg = srnet.SRNetConfig(scale=2, channels=32, num_blocks=8)
    params = srnet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    return cfg, params, x


@pytest.mark.parametrize("pipe,n_micro", [(4, 4), (8, 8), (2, 4), (4, 2)])
def test_pipeline_matches_unpipelined(setup, pipe, n_micro):
    cfg, params, x = setup
    mesh = make_mesh(data=-1, tensor=1, spatial=1, pipe=pipe)
    ref = srnet.apply(params, x, cfg)
    got = jax.jit(
        lambda p, v: srnet_pipeline_apply(p, v, cfg, mesh, n_micro=n_micro)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pipeline_bf16(setup):
    cfg, params, x = setup
    mesh = make_mesh(data=-1, tensor=1, spatial=1, pipe=4)
    ref = srnet.apply(params, x.astype(jnp.bfloat16), cfg).astype(np.float32)
    got = jax.jit(
        lambda p, v: srnet_pipeline_apply(p, v, cfg, mesh, n_micro=4)
    )(params, x.astype(jnp.bfloat16)).astype(np.float32)
    assert float(jnp.max(jnp.abs(got - ref))) <= 0.05


def test_pipeline_geometry_validation(setup):
    cfg, params, x = setup
    mesh = make_mesh(data=-1, tensor=1, spatial=1, pipe=8)
    with pytest.raises(ValueError):
        srnet_pipeline_apply(params, x, cfg, mesh, n_micro=3)  # 8 % 3 != 0
    cfg5 = srnet.SRNetConfig(scale=2, channels=32, num_blocks=5)
    params5 = srnet.init(jax.random.PRNGKey(0), cfg5)
    with pytest.raises(ValueError):
        srnet_pipeline_apply(params5, x, cfg5, mesh, n_micro=4)  # 5 blocks % 8


# ------------------------------------------------------------ UNet pipeline


@pytest.fixture(scope="module")
def unet_setup():
    from image_restoration_platform_tpu.models import unet

    cfg = unet.UNetConfig(
        base_channels=32, norm_groups=8, blocks_per_level=1, emb_dim=64
    )
    params = unet.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (8, 28)).astype(np.float32))
    return cfg, params, x, cond


def test_unet_pipeline_matches_apply(unet_setup):
    """Stage-selective UNet pipelining (VERDICT r2 next #9) over pipe=4
    composed with data=2 must reproduce models.unet.apply: same ops, same
    order, only placement differs."""
    from image_restoration_platform_tpu.models import unet
    from image_restoration_platform_tpu.parallel.pipeline import unet_pipeline_apply

    cfg, params, x, cond = unet_setup
    mesh = make_mesh(data=2, tensor=1, spatial=1, pipe=4)
    ref = np.asarray(unet.apply(params, x, cond, config=cfg))
    got = np.asarray(
        jax.jit(
            lambda p, v, c: unet_pipeline_apply(p, v, c, cfg, mesh, n_micro=4)
        )(params, x, cond)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_unet_pipeline_full_pipe_axis(unet_setup):
    """All 8 devices on the pipe axis (one segment group each)."""
    from image_restoration_platform_tpu.models import unet
    from image_restoration_platform_tpu.parallel.pipeline import unet_pipeline_apply

    cfg, params, x, cond = unet_setup
    mesh = make_mesh(data=1, tensor=1, spatial=1, pipe=8)
    ref = np.asarray(unet.apply(params, x, cond, config=cfg))
    got = np.asarray(
        jax.jit(
            lambda p, v, c: unet_pipeline_apply(p, v, c, cfg, mesh, n_micro=4)
        )(params, x, cond)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_unet_pipeline_bubble_fraction():
    from image_restoration_platform_tpu.parallel.pipeline import (
        pipeline_bubble_fraction,
    )

    assert pipeline_bubble_fraction(4, 4) == pytest.approx(3 / 7)
    assert pipeline_bubble_fraction(16, 4) == pytest.approx(3 / 19)
    # deep microbatching drives the bubble toward zero
    assert pipeline_bubble_fraction(64, 8) < 0.1
