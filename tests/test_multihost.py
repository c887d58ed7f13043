"""Multi-host DCN bring-up (SURVEY section 2.3 / VERDICT r2 item 45).

Real multi-host hardware is unavailable, but jax.distributed works across
PROCESSES on CPU: two coordinator-connected processes, each owning 4 local
virtual devices, form one 8-device global mesh. This exercises the actual
maybe_initialize_distributed() env hook (JAX_COORDINATOR / JAX_PROCESS_ID /
JAX_NUM_PROCESSES), global-mesh construction over non-addressable devices,
and a cross-process psum — the DCN path, not a simulation of it.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from image_restoration_platform_tpu.parallel.mesh import maybe_initialize_distributed

maybe_initialize_distributed()
assert jax.process_count() == 2, f"process_count={jax.process_count()}"
assert len(jax.devices()) == 8, f"global devices={len(jax.devices())}"
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# global 8-device data mesh spanning both processes (DCN boundary between
# the two 4-device hosts)
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

@jax.jit
def global_sum(x):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))

with mesh:
    # each process contributes its local shard of a global [8] array
    pid = jax.process_count() and int(os.environ["JAX_PROCESS_ID"])
    local = np.arange(4, dtype=np.float32) + 4 * pid
    arrs = [
        jax.device_put(local[i : i + 1], d) for i, d in enumerate(jax.local_devices())
    ]
    global_arr = jax.make_array_from_single_device_arrays(
        (8,), NamedSharding(mesh, P("data")), arrs
    )
    total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(
        global_arr
    )
    # the all-reduce crossed the process (DCN) boundary: 0+1+...+7
    assert float(total.addressable_shards[0].data) == 28.0, float(
        total.addressable_shards[0].data
    )
print(f"worker {os.environ['JAX_PROCESS_ID']} ok", flush=True)
"""


def test_two_process_global_mesh_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_COORDINATOR"] = coord
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        flags = [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        ]
        flags.append("--xla_force_host_platform_device_count=4")
        env["XLA_FLAGS"] = " ".join(flags)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=repo_root,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"worker {pid} ok" in out
