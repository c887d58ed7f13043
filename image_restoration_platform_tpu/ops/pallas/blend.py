"""Pallas overlap-blend kernel: windowed fold of overlapping tiles.

The XLA formulation in ops/tile.py expresses the fold as N sequential
dynamic-update-slice read-modify-writes over the full output accumulator —
each tile round-trips the accumulator through HBM. This kernel inverts the
loop: the grid runs over output *strips* (one per tile row); each program
instance owns a strip of the output in VMEM, DMAs in just the tiles that
intersect it, and accumulates on-chip. Weight normalisation happens in the
same kernel, so each output element is written to HBM exactly once
(HBM-bandwidth rule from the Pallas guide).

Geometry is static per (H, W, tile, overlap): tile origins follow
ops.tile.tile_grid (stride = tile - overlap, last tile clamped to the edge).
Strip r owns output rows [ys[r], ys[r+1]) (last strip to H). A tile row rr
contributes to strip r iff [ys[rr], ys[rr]+T) intersects the strip — the
contributor lists are Python-static and unrolled.

Mosaic layout notes: everything in-kernel is 2D in a *channel-planar* layout
(planar[i, ch*W + j] = img[i, j, ch], flattened outside the kernel — Mosaic
cannot shape-cast [T,T,C]->[T,T*C] in-kernel), and row placement uses a
one-hot selection matmul ([strip_h, T] @ [T, C*T]) so the scatter runs on the
MXU uniformly across interior and edge strips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tile import _hann_window


def blend_tiles_pallas(
    tiles: jax.Array,  # [n_tiles, T, T, C], row-major over (ty, tx)
    out_hw: tuple[int, int],
    ys: tuple,
    xs: tuple,
    interpret: bool = False,
) -> jax.Array:
    """Seam-free windowed blend of overlapping tiles -> [H, W, C] f32.

    Numerically equivalent to ops.tile.blend_tiles (scale=1).
    """
    n_tiles, t, _, c = tiles.shape
    out_h, out_w = out_hw
    n_ty, n_tx = len(ys), len(xs)
    assert n_ty * n_tx == n_tiles, "tile count does not match grid"

    window = _hann_window(t)  # [T, T] f32 numpy
    win_planar = jnp.asarray(np.tile(window, (1, c)))  # [T, C*T]
    win_plain = jnp.asarray(window)

    own_lo = list(ys)
    own_hi = [ys[r + 1] for r in range(n_ty - 1)] + [out_h]
    strip_h = max(hi - lo for lo, hi in zip(own_lo, own_hi))

    contrib = [
        [rr for rr in range(n_ty) if ys[rr] < own_hi[r] and ys[rr] + t > own_lo[r]]
        for r in range(n_ty)
    ]
    max_contrib = max(len(rows) for rows in contrib)
    contrib_tbl = jnp.asarray(
        [[rows[k] if k < len(rows) else -1 for k in range(max_contrib)] for rows in contrib],
        dtype=jnp.int32,
    )
    ys_arr = jnp.asarray(ys, dtype=jnp.int32)
    lo_arr = jnp.asarray(own_lo, dtype=jnp.int32)

    # channel-planar tiles [n_ty, n_tx, T, C*T] (flattened outside the kernel)
    tiles_planar = (
        tiles.astype(jnp.float32)
        .reshape(n_ty, n_tx, t, t, c)
        .transpose(0, 1, 2, 4, 3)
        .reshape(n_ty, n_tx, t, c * t)
    )

    def kernel(contrib_ref, ys_ref, lo_ref, tiles_hbm, winp_ref, win_ref, out_ref):
        r = pl.program_id(0)

        def body(tile_vmem, acc_ref, wacc_ref, sem):
            acc_ref[...] = jnp.zeros((strip_h, c * out_w), dtype=jnp.float32)
            wacc_ref[...] = jnp.zeros((strip_h, out_w), dtype=jnp.float32)

            for k in range(max_contrib):
                rr = contrib_ref[r, k]
                valid = rr >= 0
                rr_safe = jnp.maximum(rr, 0)
                off = ys_ref[rr_safe] - lo_ref[r]

                # one-hot row placement: select[s, j] = 1 iff s == off + j
                strip_ids = jax.lax.broadcasted_iota(jnp.int32, (strip_h, t), 0)
                tile_ids = jax.lax.broadcasted_iota(jnp.int32, (strip_h, t), 1)
                select = ((strip_ids == tile_ids + off) & valid).astype(jnp.float32)

                for cx in range(n_tx):
                    dma = pltpu.make_async_copy(
                        tiles_hbm.at[rr_safe, cx], tile_vmem, sem
                    )
                    dma.start()
                    dma.wait()
                    weighted = tile_vmem[...] * winp_ref[...]  # [T, C*T]
                    placed = jax.lax.dot(
                        select, weighted, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [strip_h, C*T]
                    wplaced = jax.lax.dot(
                        select, win_ref[...], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [strip_h, T]

                    x0 = xs[cx]  # static python int
                    for ch in range(c):
                        acc_ref[:, ch * out_w + x0 : ch * out_w + x0 + t] += placed[
                            :, ch * t : (ch + 1) * t
                        ]
                    wacc_ref[:, x0 : x0 + t] += wplaced

            inv = pl.reciprocal(jnp.maximum(wacc_ref[...], 1e-8))
            inv_planar = jnp.concatenate([inv] * c, axis=1)  # [strip_h, C*out_w]
            out_ref[...] = (acc_ref[...] * inv_planar)[None]

        pl.run_scoped(
            body,
            pltpu.VMEM((t, c * t), jnp.float32),
            pltpu.VMEM((strip_h, c * out_w), jnp.float32),
            pltpu.VMEM((strip_h, out_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # contributor table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile-row origins
            pl.BlockSpec(memory_space=pltpu.SMEM),  # strip ownership starts
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # planar window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # plain window
        ],
        out_specs=pl.BlockSpec(
            (1, strip_h, c * out_w),
            lambda r: (r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_ty, strip_h, c * out_w), jnp.float32),
        interpret=interpret,
    )(contrib_tbl, ys_arr, lo_arr, tiles_planar, win_planar, win_plain)

    # planar -> interleaved: [H, C*W] -> [H, C, W] -> [H, W, C]
    rows = [out[r, : own_hi[r] - own_lo[r]] for r in range(n_ty)]
    planar = jnp.concatenate(rows, axis=0)
    return planar.reshape(out_h, c, out_w).transpose(0, 2, 1)
