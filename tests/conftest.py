"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against ``--xla_force_host_platform_device_count=8`` (SURVEY.md section 4),
the standard way to validate pjit/shard_map programs without a pod.
"""

import os

# must be set before jax initialises its backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("ALLOW_DEGRADED", "1")

import jax  # noqa: E402

# the sandbox site config pins JAX_PLATFORMS to the TPU plugin; the config
# update (not the env var) is what actually forces CPU here
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices()
