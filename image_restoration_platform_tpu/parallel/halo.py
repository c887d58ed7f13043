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


def halo_exchange_rows(x: jax.Array, halo: int, axis_name: str = AXIS_SPATIAL) -> jax.Array:
    """Inside shard_map: extend a row-sharded [H_loc, W, C] block with ``halo``
    rows from the previous/next shard (edge-replicated at the boundaries)."""
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

    # boundary shards replicate their own edge rows instead of wrapping
    edge_top = jnp.repeat(x[:1], halo, axis=0)
    edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where(idx == 0, edge_top, from_prev)
    bot = jnp.where(idx == n - 1, edge_bot, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def spatial_shard_apply(fn, mesh: Mesh, halo: int):
    """Lift ``fn`` ([H+2*halo, W, C] -> [H, W, C] on the valid region) to a
    row-sharded [H, W, C] image on ``mesh``'s spatial axis.

    ``fn`` receives the halo-extended local block and must return the result
    for the *extended* block; the wrapper crops the halo off. This matches
    stencil semantics: compute everywhere, keep the valid center.
    """
    spec = P(AXIS_SPATIAL, None, None)

    def local(x_loc):
        ext = halo_exchange_rows(x_loc, halo)
        out = fn(ext)
        return out[halo:-halo] if halo > 0 else out

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
