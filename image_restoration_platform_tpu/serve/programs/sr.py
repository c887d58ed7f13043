"""Tiled / spatially-sharded super-resolution programs.

The whole tile -> SR -> Hann-blend pipeline (ops/tile.py) traces into a
single jit program per canvas size: tile extraction, batched SRNet calls
over tile chunks, and the windowed fold all fuse device-side — no host
round-trips between tiles (BASELINE.json config 3: 2K -> 4K; SURVEY.md
section 5's long-context analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models import get_family
from ...parallel.mesh import AXIS_DATA, AXIS_SPATIAL
from .egress import to_yuv420


def _sr_fn_builder(sr_apply, cfg, dtype):
    def build(params):
        def per_tiles(tiles):
            x = tiles.astype(dtype) / dtype(255.0)
            out = sr_apply(params, x, cfg)
            return out.astype(jnp.float32) * 255.0

        return per_tiles

    return build


def build_sr_tiled_program(
    family_name: str, *, dtype, sr_apply, tile: int, overlap: int,
    tile_batch: int, output: str,
):
    """Single-device tiled SR: ``fn(params, canvas [H,W,3] u8)``."""
    from ...ops.tile import tiled_apply

    cfg = get_family(family_name).config
    scale = cfg.scale
    builder = _sr_fn_builder(sr_apply, cfg, dtype)

    def program(params, canvas):
        img = canvas.astype(jnp.float32)
        out = tiled_apply(
            img, builder(params), tile=tile, overlap=overlap,
            scale=scale, tile_batch=tile_batch,
        )
        if output == "yuv420":
            return to_yuv420(out)
        return jnp.round(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)

    return jax.jit(program)


def build_sr_tiled_mesh_program(
    family_name: str, *, dtype, sr_apply, mesh, tile: int, overlap: int,
    tile_batch: int, output: str,
):
    """Mesh tiled SR: the tile axis shards over ``data`` — every device
    restores its slice of the tile batch, then the windowed fold runs on the
    gathered results. Output matches single-device exactly (tiling, SR, and
    blend are per-tile/per-pixel deterministic)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ...ops.tile import blend_tiles, tile_image

    cfg = get_family(family_name).config
    scale = cfg.scale
    builder = _sr_fn_builder(sr_apply, cfg, dtype)
    dp = mesh.shape[AXIS_DATA]
    tiles_sharding = NamedSharding(mesh, P(AXIS_DATA, None, None, None))
    replicated = NamedSharding(mesh, P())
    mesh_chunk = tile_batch * dp

    def program(params, canvas):
        img = canvas.astype(jnp.float32)
        tiles, ys, xs = tile_image(img, tile, overlap)
        n = tiles.shape[0]
        sr = builder(params)
        pad = (-n) % mesh_chunk if n > mesh_chunk else (-n) % dp
        if pad:
            tiles = jnp.concatenate([tiles, jnp.repeat(tiles[-1:], pad, axis=0)], axis=0)
        chunks = []
        step = min(mesh_chunk, tiles.shape[0])
        for i in range(0, tiles.shape[0], step):
            chunk = jax.lax.with_sharding_constraint(tiles[i : i + step], tiles_sharding)
            chunks.append(sr(chunk))
        out_tiles = jnp.concatenate(chunks, axis=0)[:n]
        # gather for the windowed fold (cheap relative to the convs)
        out_tiles = jax.lax.with_sharding_constraint(out_tiles, replicated)
        h, w, _ = canvas.shape
        out = blend_tiles(out_tiles, (h, w), ys, xs, scale=scale)
        if output == "yuv420":
            return to_yuv420(out)
        return jnp.round(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)

    return jax.jit(program)


def build_sr_spatial_program(family_name: str, *, dtype, mesh):
    """Row-sharded SR over the mesh's spatial axis with per-layer ppermute
    halo exchange (parallel/halo.py) — for ONE image too large to
    tile-batch. Every conv exchanges one boundary row with zero fill at the
    true image edges, reproducing XLA 'SAME' padding; matches the
    single-device program to bf16 accumulation-order jitter."""
    from ...models import srnet
    from ...parallel.halo import spatial_shard_model_apply

    cfg = get_family(family_name).config

    def local_fn(params, block):
        # [H_loc, W, 3] local rows; convs self-exchange halos per layer.
        # apply_rowsharded is the UNLIMITED network — the residual spectral
        # limiter (srnet.residual_limit) uses only fixed small-support
        # filters of (input, output), so it runs below on the gathered full
        # canvas, reproducing srnet.apply's in-model limiter exactly without
        # sharding the limiter statistics.
        x = block.astype(dtype) / dtype(255.0)
        out = srnet.apply_rowsharded(params, x, cfg)
        return out.astype(jnp.float32) * 255.0

    sharded_apply = spatial_shard_model_apply(local_fn, mesh)

    def program(params, canvas):
        canvas_f = canvas.astype(jnp.float32)
        out = sharded_apply(params, canvas_f)
        if cfg.limit_pool > 0:
            out = (
                srnet.residual_limit(
                    canvas_f[None] / 255.0, out[None] / 255.0, cfg
                )[0]
                * 255.0
            )
        return jnp.round(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)

    return jax.jit(program), srnet.receptive_halo(cfg), cfg.scale, mesh.shape[AXIS_SPATIAL]
