"""Device mesh construction over ICI (+ DCN for multi-host).

The reference's "distributed backend" is Redis + BullMQ (SURVEY.md section
2.3); the device-parallel layer it lacks lives here. Axes:

  data    — batch-sharded serving/training (DP)
  tensor  — channel/head-sharded model parallelism (TP)
  spatial — image-row sharding for large tiled inference, the image-domain
            analog of sequence/context parallelism (SP); halo exchange in
            parallel/halo.py rides ``ppermute`` over this axis
  pipe    — GPipe-style stage pipelining of homogeneous conv chains
            (parallel/pipeline.py); microbatch payloads flow stage-to-stage
            via ``ppermute`` ring steps

``jax.make_mesh`` lays devices out so the innermost axes map to ICI neighbours
(contiguous device order); across hosts, ``jax.distributed.initialize`` (see
``maybe_initialize_distributed``) extends the same mesh over DCN with the data
axis outermost, which keeps collective-heavy TP/SP traffic on ICI.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_TENSOR = "tensor"
AXIS_SPATIAL = "spatial"
AXIS_PIPE = "pipe"


def mesh_axes() -> tuple[str, str, str, str]:
    return (AXIS_DATA, AXIS_TENSOR, AXIS_SPATIAL, AXIS_PIPE)


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up via env (JAX_COORDINATOR / JAX_PROCESS_ID).

    Must run before anything touches the XLA backend — which is why the
    idempotence guard inspects the distributed client state instead of
    calling jax.process_count() (that call would itself initialise the
    backend and make jax.distributed.initialize() impossible; found by
    tests/test_multihost.py)."""
    coordinator = os.environ.get("JAX_COORDINATOR")
    if not coordinator:
        return
    try:
        from jax._src import distributed as _distributed

        if getattr(_distributed.global_state, "client", None) is not None:
            return  # already initialized
    except Exception:  # pragma: no cover - private-API drift (ADVICE r3 #3)
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        )
    except RuntimeError as error:  # real idempotence backstop if the private
        # global_state probe above stops working after a JAX upgrade
        if "already" not in str(error).lower():
            raise


def make_mesh(
    devices=None,
    data: int = -1,
    tensor: int = 1,
    spatial: int = 1,
    pipe: int = 1,
) -> Mesh:
    """Build a (data, tensor, spatial, pipe) mesh. ``data=-1`` absorbs the
    rest. ``pipe`` is innermost so pipeline-neighbour ppermute hops ride
    adjacent ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    inner = tensor * spatial * pipe
    if inner > n or n % inner != 0:
        raise ValueError(
            f"{n} devices not divisible by tensor({tensor}) x spatial({spatial}) x pipe({pipe})"
        )
    if data == -1:
        data = n // inner
    if data * inner != n:
        raise ValueError(f"mesh {data}x{tensor}x{spatial}x{pipe} != device count {n}")
    import numpy as np

    dev_array = np.asarray(devices).reshape(data, tensor, spatial, pipe)
    return Mesh(dev_array, mesh_axes())


@lru_cache(maxsize=1)
def default_mesh() -> Mesh:
    """Process-wide mesh from MESH_DATA/MESH_TENSOR/MESH_SPATIAL env knobs."""
    from ..config import load_config

    cfg = load_config().mesh
    return make_mesh(data=cfg.data, tensor=cfg.tensor, spatial=cfg.spatial)
