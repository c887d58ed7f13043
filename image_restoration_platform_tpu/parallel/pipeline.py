"""GPipe-style pipeline parallelism over the ``pipe`` mesh axis.

SURVEY.md section 2.3 lists pipeline parallelism as the optional device-
parallel mechanism (cf. the PipeFusion patch-pipeline pattern in PAPERS.md).
This is the SPMD formulation: every device holds ONE stage's parameters (a
contiguous chunk of homogeneous residual blocks), microbatch payloads flow
stage-to-stage with ``ppermute`` ring steps, and the classic pipeline
schedule (n_micro + P - 1 ticks, bubbles at fill/drain) emerges from a
static Python loop — one compiled program, collectives on ICI.

SRNet is the natural target: its body is a chain of identical
conv-SiLU-conv residual blocks ([H,W,C] -> [H,W,C]), so inter-stage payloads
are uniform and the cheap stem/head run data-parallel outside the pipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import nn
from .mesh import AXIS_PIPE


def _stack_blocks(blocks: list[dict]):
    """List of identical-structure param dicts -> one stacked pytree with a
    leading [B] axis (scan-able)."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *blocks)


def srnet_pipeline_apply(params: dict, x: jax.Array, config, mesh: Mesh,
                         n_micro: int = 4) -> jax.Array:
    """SRNet forward with the residual-block chain pipelined over ``pipe``.

    x: [N, H, W, 3] in [0, 1]; N must divide by n_micro; the block count must
    divide by the pipe-axis size. Matches models.srnet.apply exactly (same
    ops, same order — only the device placement differs).
    """
    c = config
    pipe = mesh.shape[AXIS_PIPE]
    blocks = params["blocks"]
    if len(blocks) % pipe != 0:
        raise ValueError(f"{len(blocks)} blocks not divisible by pipe={pipe}")
    n = x.shape[0]
    if n % n_micro != 0:
        raise ValueError(f"batch {n} not divisible by n_micro={n_micro}")
    per_stage = len(blocks) // pipe
    mb = n // n_micro
    dtype = x.dtype

    # stage-stacked block params: leaves [pipe, per_stage, ...], sharded so
    # each device holds exactly its stage's chunk
    stacked = _stack_blocks(blocks)
    staged = jax.tree_util.tree_map(
        lambda l: l.reshape((pipe, per_stage) + l.shape[1:]), stacked
    )
    staged = jax.tree_util.tree_map(
        lambda l: jax.lax.with_sharding_constraint(
            l, NamedSharding(mesh, P(AXIS_PIPE))
        ),
        staged,
    )

    # stem (cheap, data-parallel, replicated over pipe): [n_micro, mb, H, W, C]
    h0 = nn.conv2d(params["stem"], x)
    feats_in = h0.reshape((n_micro, mb) + h0.shape[1:])

    def local_pipeline(staged_local, feats):
        # staged_local leaves: [1, per_stage, ...] — this device's stage
        my_blocks = jax.tree_util.tree_map(lambda l: l[0], staged_local)
        idx = jax.lax.axis_index(AXIS_PIPE)

        def stage_fn(feat):
            def body(f, bp):
                r = nn.conv2d(bp["conv1"], f)
                r = nn.silu(r)
                r = nn.conv2d(bp["conv2"], r)
                return f + 0.2 * r, None

            out, _ = jax.lax.scan(body, feat, my_blocks)
            return out

        state = jnp.zeros_like(feats[0])
        collected = jnp.zeros((1,) + feats.shape, feats.dtype)  # [1, n_micro, mb, ...]
        ticks = n_micro + pipe - 1
        for t in range(ticks):  # static schedule -> one executable
            inject = feats[min(t, n_micro - 1)]
            state = jnp.where(
                jnp.logical_and(idx == 0, t < n_micro), inject, state
            )
            state = stage_fn(state)
            if t >= pipe - 1:
                done = jnp.where(idx == pipe - 1, state, collected[0, t - pipe + 1])
                collected = collected.at[0, t - pipe + 1].set(done)
            if pipe > 1:
                state = jax.lax.ppermute(
                    state, AXIS_PIPE, perm=[(i, i + 1) for i in range(pipe - 1)]
                )
        return collected

    pspec = jax.tree_util.tree_map(lambda _: P(AXIS_PIPE), staged)
    collected = jax.shard_map(
        local_pipeline,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(AXIS_PIPE),
        check_vma=False,
    )(staged, feats_in)

    # only the last stage's collection slot holds real outputs
    feat = collected[pipe - 1].reshape(h0.shape).astype(dtype)

    # head (cheap, data-parallel): pre_up + global stem skip, upsample
    feat = nn.conv2d(params["pre_up"], feat) + h0
    up = nn.conv2d(params["up"], feat)
    up = nn.pixel_shuffle(up, c.scale)
    return up + nn.upsample_nearest(x, c.scale)
