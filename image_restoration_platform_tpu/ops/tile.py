"""Patch tiling with seam-free overlap-blend compositing.

The reference downsizes anything >2048 px and never tiles (imagePreprocess.js:4,
44-54); our large-image path (BASELINE.json config 3) instead splits the image
into overlapping tiles, restores each tile on device, and composites with a
raised-cosine (Hann) window normalised to a partition of unity — so the blended
result is seam-free and PSNR-matches whole-image inference for linear models.

Tiling layout is static per (H, W, tile, overlap) so everything compiles once:
  - ``tile_image``  : [H, W, C] -> [n_tiles, T, T, C] strided view via gather
  - ``blend_tiles`` : inverse fold with windowed accumulation

The fold is expressed as one scatter-add over a precomputed index map, which
XLA lowers efficiently; a Pallas variant lives in ops/pallas/blend.py for the
hot serving path.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def tile_grid(size: int, tile: int, stride: int) -> tuple[int, ...]:
    """Start offsets of tiles covering [0, size) with tile length ``tile``.

    The final tile is clamped so it ends exactly at ``size`` (full coverage
    without ragged shapes); consecutive starts step by ``stride``.
    """
    if size <= tile:
        return (0,)
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    # deduplicate while preserving order (can collide when stride divides size-tile)
    seen: set[int] = set()
    out = []
    for s in starts:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return tuple(out)


@lru_cache(maxsize=32)
def _hann_window(tile: int) -> np.ndarray:
    # raised cosine, strictly positive so weight normalisation is safe
    n = np.arange(tile, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (n + 0.5) / tile)
    w = np.maximum(w, 1e-3)
    return (w[:, None] * w[None, :]).astype(np.float32)


def tile_image(img: jax.Array, tile: int, overlap: int) -> tuple[jax.Array, tuple, tuple]:
    """Split [H, W, C] into overlapping [N, tile, tile, C] tiles."""
    h, w, _ = img.shape
    stride = tile - overlap
    ys = tile_grid(h, tile, stride)
    xs = tile_grid(w, tile, stride)
    rows = []
    for y in ys:
        for x in xs:
            rows.append(jax.lax.dynamic_slice(img, (y, x, 0), (tile, tile, img.shape[2])))
    return jnp.stack(rows, axis=0), ys, xs


def blend_tiles(
    tiles: jax.Array,
    out_hw: tuple[int, int],
    ys: tuple,
    xs: tuple,
    scale: int = 1,
) -> jax.Array:
    """Composite [N, T, T, C] tiles back to [H*scale, W*scale, C], windowed.

    ``scale`` supports super-resolution tiling: tiles produced at T*scale from
    source offsets (y, x) land at (y*scale, x*scale).
    """
    n, t, _, c = tiles.shape
    out_h, out_w = out_hw[0] * scale, out_hw[1] * scale
    window = jnp.asarray(_hann_window(t))

    acc = jnp.zeros((out_h, out_w, c), dtype=jnp.float32)
    wacc = jnp.zeros((out_h, out_w, 1), dtype=jnp.float32)
    weighted = tiles.astype(jnp.float32) * window[None, :, :, None]

    idx = 0
    for y in ys:
        for x in xs:
            yo, xo = y * scale, x * scale
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(acc, (yo, xo, 0), (t, t, c)) + weighted[idx],
                (yo, xo, 0),
            )
            wacc = jax.lax.dynamic_update_slice(
                wacc,
                jax.lax.dynamic_slice(wacc, (yo, xo, 0), (t, t, 1)) + window[:, :, None],
                (yo, xo, 0),
            )
            idx += 1
    return acc / wacc


def tiled_apply(
    img: jax.Array,
    fn,
    tile: int,
    overlap: int,
    scale: int = 1,
    tile_batch: int | None = None,
    use_pallas_blend: bool | None = None,
) -> jax.Array:
    """Run ``fn`` ([N,T,T,C] -> [N,T*scale,T*scale,C']) over overlapping tiles
    of [H, W, C] and blend the results seam-free.

    ``tile_batch`` chunks the tile axis so VMEM/HBM stay bounded for huge
    images; chunks map to the same compiled executable.
    """
    h, w, _ = img.shape
    tiles, ys, xs = tile_image(img, tile, overlap)
    n = tiles.shape[0]
    if tile_batch is None or tile_batch >= n:
        out_tiles = fn(tiles)
    else:
        chunks = []
        pad = (-n) % tile_batch
        padded = jnp.concatenate([tiles, jnp.repeat(tiles[-1:], pad, axis=0)], axis=0) if pad else tiles
        for i in range(0, padded.shape[0], tile_batch):
            chunks.append(fn(padded[i : i + tile_batch]))
        out_tiles = jnp.concatenate(chunks, axis=0)[:n]

    if use_pallas_blend is None:
        import os

        use_pallas_blend = os.environ.get("IRP_PALLAS_BLEND", "0") == "1"
    if use_pallas_blend and scale >= 1:
        from .pallas.blend import blend_tiles_pallas

        out_ys = tuple(y * scale for y in ys)
        out_xs = tuple(x * scale for x in xs)
        return blend_tiles_pallas(out_tiles, (h * scale, w * scale), out_ys, out_xs)
    return blend_tiles(out_tiles, (h, w), ys, xs, scale=scale)
