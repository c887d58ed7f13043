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
