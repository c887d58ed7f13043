"""Halo exchange for spatially-sharded stencils/convs over the mesh.

The image-domain analog of ring attention / context parallelism (SURVEY.md
section 5 "long-context"): a large image is sharded by rows across the
``spatial`` mesh axis; convolutions need ``halo`` rows from each neighbour, so
before a sharded stencil we ``ppermute`` boundary rows up and down the axis.
Collectives ride ICI — no host round-trip.

``spatial_shard_apply`` wraps a per-shard function in shard_map with the halo
pattern: pad-with-neighbour-rows -> fn -> crop. For a stack of convs with
total receptive field r, pass halo >= r//2.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import AXIS_SPATIAL


def halo_exchange_rows(
    x: jax.Array, halo: int, axis_name: str = AXIS_SPATIAL, boundary: str = "edge"
) -> jax.Array:
    """Inside shard_map: extend a row-sharded [H_loc, W, C] block with ``halo``
    rows from the previous/next shard.

    ``boundary`` controls the outermost shards' missing neighbours:
    ``edge`` replicates their own edge rows (clamped-stencil semantics);
    ``zero`` fills zeros, matching XLA 'SAME' conv padding so a conv stack run
    shard-wise is bit-identical to the whole-image program.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:halo]
    bot_rows = x[-halo:]

    # receive the *previous* shard's bottom rows as my top halo
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, perm=[(i, (i + 1) % n) for i in range(n)]
    )
    # receive the *next* shard's top rows as my bottom halo
    from_next = jax.lax.ppermute(
        top_rows, axis_name, perm=[(i, (i - 1) % n) for i in range(n)]
    )

    if boundary == "zero":
        edge_top = jnp.zeros_like(from_prev)
        edge_bot = jnp.zeros_like(from_next)
    else:
        edge_top = jnp.repeat(x[:1], halo, axis=0)
        edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where(idx == 0, edge_top, from_prev)
    bot = jnp.where(idx == n - 1, edge_bot, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def spatial_shard_apply(fn, mesh: Mesh, halo: int, boundary: str = "edge"):
    """Lift ``fn`` ([H+2*halo, W, C] -> [H, W, C] on the valid region) to a
    row-sharded [H, W, C] image on ``mesh``'s spatial axis.

    ``fn`` receives the halo-extended local block and must return the result
    for the *extended* block; the wrapper crops the halo off. This matches
    stencil semantics: compute everywhere, keep the valid center.
    """
    spec = P(AXIS_SPATIAL, None, None)

    def local(x_loc):
        ext = halo_exchange_rows(x_loc, halo, boundary=boundary)
        out = fn(ext)
        return out[halo:-halo] if halo > 0 else out

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )


def conv2d_rowsharded(params: dict, x: jax.Array, axis_name: str = AXIS_SPATIAL) -> jax.Array:
    """Row-sharded SAME 3x3 conv inside shard_map: exchange ONE boundary row
    each way (zeros at the true image edges, matching XLA 'SAME' padding),
    then convolve the extended block with vertical-VALID / horizontal-SAME.

    Per-layer exchange is the exact formulation for deep conv stacks: a
    one-shot deep halo is NOT equivalent because every conv's bias and
    nonlinearity would contaminate the region that 'SAME' zero-padding
    provides at the image boundary. This is the image-domain analog of how
    context-parallel attention re-exchanges per layer.
    """
    ext = halo_exchange_rows(x, 1, axis_name, boundary="zero")
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        ext[None],
        w,
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )[0]
    return out + b


def spatial_shard_model_apply(local_fn, mesh: Mesh):
    """Lift ``local_fn(params, block)`` — a per-shard model body whose convs
    self-exchange halos via ``conv2d_rowsharded`` — onto a row-sharded
    [H, W, C] image on ``mesh``'s spatial axis with replicated params.

    The huge-tile counterpart of data-axis tile sharding: one image too large
    to tile-batch is split across devices (SURVEY.md section 5 long-context
    analog); collectives ride ICI.
    """
    spec = P(AXIS_SPATIAL, None, None)

    def wrapped(params, x):
        pspecs = jax.tree_util.tree_map(lambda _: P(), params)
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(pspecs, spec),
            out_specs=spec,
            check_vma=False,
        )(params, x)

    return wrapped
