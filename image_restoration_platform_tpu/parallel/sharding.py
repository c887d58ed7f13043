"""Sharding policies: how params and activations lay out on the mesh.

GSPMD does the collective insertion; our job is the layout. Policy:

  activations [N, H, W, C] — N over ``data``, H over ``spatial``; C stays on
    the lane axis unsharded (convs consume full C per device under TP — GSPMD
    all-gathers weights, not activations, which is the cheap direction here)
  conv kernels [kh, kw, in, out] — ``out`` over ``tensor`` when divisible
  dense [in, out] — ``out`` over ``tensor`` (column-parallel); the following
    reduction is GSPMD-inserted (Megatron-style without manual psum)
  norm scales / biases — replicated (tiny)

Param path names from models/nn.py are stable, so rules match on leaf shape,
which is robust across families (UNet / SRNet / diffusion share layer types).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_SPATIAL, AXIS_TENSOR


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def activation_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """NHWC activations: batch over data, rows over spatial."""
    return NamedSharding(
        mesh, P(AXIS_DATA, AXIS_SPATIAL if spatial else None, None, None)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """1-D per-example leaves (conditioning vectors, timesteps)."""
    return NamedSharding(mesh, P(AXIS_DATA))


def _leaf_spec(leaf: jax.Array, tensor_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and shape[-1] % tensor_size == 0 and shape[-1] >= 64:
        return P(None, None, None, AXIS_TENSOR)  # conv kernel, column-parallel
    if len(shape) == 2 and shape[-1] % tensor_size == 0 and shape[-1] >= 64:
        return P(None, AXIS_TENSOR)  # dense, column-parallel
    return P()


def param_specs(params, tensor_size: int):
    return jax.tree_util.tree_map(lambda p: _leaf_spec(p, tensor_size), params)


def shard_params(params, mesh: Mesh):
    """Device_put params with TP layout (no-op layout on a 1-sized axis)."""
    tensor_size = mesh.shape[AXIS_TENSOR]
    specs = param_specs(params, tensor_size)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching ``params`` (for jit in_shardings)."""
    tensor_size = mesh.shape[AXIS_TENSOR]
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, _leaf_spec(p, tensor_size)), params
    )
