"""SRNet — super-resolution backbone for the tiled 2K->4K path.

Serves BASELINE.json config 3 (large-image tiled super-resolution with
overlap-blend). A residual-in-residual CNN with a pixel-shuffle upsampler:
conv stem -> K residual blocks (conv-SiLU-conv, 0.2-scaled residuals) ->
depth-to-space x`scale` head, plus a global skip of the nearest-upsampled
input so zero-init weights start at nearest-neighbour SR.

Runs per-tile under ops.tile.tiled_apply; channels (64) and tile sizes
(multiples of 128) keep the convs MXU-aligned in bf16.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import nn


@dataclass(frozen=True)
class SRNetConfig:
    scale: int = 2
    channels: int = 64
    num_blocks: int = 8
    in_channels: int = 3


def init(key: jax.Array, config: SRNetConfig = SRNetConfig()) -> dict:
    c = config
    keys = iter(jax.random.split(key, c.num_blocks * 2 + 4))
    params: dict = {"stem": nn.conv_init(next(keys), c.in_channels, c.channels)}
    params["blocks"] = [
        {
            "conv1": nn.conv_init(next(keys), c.channels, c.channels),
            "conv2": nn.conv_init(next(keys), c.channels, c.channels, scale=0.1),
        }
        for _ in range(c.num_blocks)
    ]
    params["pre_up"] = nn.conv_init(next(keys), c.channels, c.channels)
    # zero-init upsampler head -> network starts as exact nearest-neighbour SR
    params["up"] = {
        "w": jnp.zeros((3, 3, c.channels, c.in_channels * c.scale * c.scale), jnp.float32),
        "b": jnp.zeros((c.in_channels * c.scale * c.scale,), jnp.float32),
    }
    return params


def receptive_halo(config: SRNetConfig = SRNetConfig()) -> int:
    """Receptive-field radius in input rows: stem (1) + num_blocks x two 3x3
    convs (2 each) + pre_up (1) + up (1)."""
    return 2 * config.num_blocks + 3


def apply_rowsharded(
    params: dict, x: jax.Array, config: SRNetConfig = SRNetConfig()
) -> jax.Array:
    """Row-sharded forward inside shard_map: [H_loc, W, 3] local block ->
    [H_loc*scale, W*scale, 3]. Every conv performs its own one-row halo
    exchange (parallel/halo.py conv2d_rowsharded), so the stitched result is
    bit-identical to ``apply`` on the whole image — the exact spatial-parallel
    formulation for images too large for one device."""
    from ..parallel.halo import conv2d_rowsharded

    c = config
    h = conv2d_rowsharded(params["stem"], x)
    feat = h
    for bp in params["blocks"]:
        r = conv2d_rowsharded(bp["conv1"], feat)
        r = nn.silu(r)
        r = conv2d_rowsharded(bp["conv2"], r)
        feat = feat + 0.2 * r
    feat = conv2d_rowsharded(params["pre_up"], feat) + h
    up = conv2d_rowsharded(params["up"], feat)
    up = nn.pixel_shuffle(up[None], c.scale)[0]
    return up + nn.upsample_nearest(x[None], c.scale)[0]


def apply(params: dict, x: jax.Array, config: SRNetConfig = SRNetConfig()) -> jax.Array:
    """[N, H, W, 3] in [0,1] -> [N, H*scale, W*scale, 3]."""
    c = config
    h = nn.conv2d(params["stem"], x)
    feat = h
    for bp in params["blocks"]:
        r = nn.conv2d(bp["conv1"], feat)
        r = nn.silu(r)
        r = nn.conv2d(bp["conv2"], r)
        feat = feat + 0.2 * r
    feat = nn.conv2d(params["pre_up"], feat) + h
    up = nn.conv2d(params["up"], feat)
    up = nn.pixel_shuffle(up, c.scale)
    return up + nn.upsample_nearest(x, c.scale)
