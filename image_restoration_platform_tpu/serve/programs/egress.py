"""Device-side egress transforms: RGB canvases -> JPEG-ready YCbCr planes.

Emitting (Y, Cb, Cr) 4:2:0 planes instead of RGB cuts device->host transfer
to 1.5 B/px — the 48 MB 4K RGB output crossing the ~34 MB/s tunnel was ~90%
of the 2K->4K wall (BASELINE config 3 / VERDICT r2 weak #3). The host feeds
the planes straight into libjpeg's raw 4:2:0 pipeline
(imageio.encode_jpeg_ycbcr420), skipping its RGB->YCbCr colorspace pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _u8(v: jax.Array) -> jax.Array:
    return jnp.round(jnp.clip(v, 0.0, 255.0)).astype(jnp.uint8)


def to_yuv420_s2d(out_s2d: jax.Array):
    """Space-to-depth-layout model output [N,h,w,12] f32 in [0,1] ->
    batched (Y [N,2h,2w], Cb [N,h,w], Cr [N,h,w]) u8 planes, JPEG
    full-range BT.601 with 2x2 box chroma subsampling.

    The 2x2 chroma block of the full-res image IS one s2d pixel's four
    (ph, pw) phase groups, and the BT.601 chroma transform is affine, so
    the box-mean of per-pixel chroma equals the chroma of the phase-mean
    RGB — planes come straight off the s2d tensor with no full-res
    3-channel intermediate (the s2d_io design, config.py)."""
    n, h, w, _ = out_s2d.shape
    p = jnp.clip(out_s2d.astype(jnp.float32), 0.0, 1.0).reshape(n, h, w, 4, 3) * 255.0
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y_ph = 0.299 * r + 0.587 * g + 0.114 * b  # [N,h,w,4] (ph, pw) order
    y = y_ph.reshape(n, h, w, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, 2 * w)
    rm, gm, bm = r.mean(axis=3), g.mean(axis=3), b.mean(axis=3)
    cb = 128.0 - 0.168735892 * rm - 0.331264108 * gm + 0.5 * bm
    cr = 128.0 + 0.5 * rm - 0.418687589 * gm - 0.081312411 * bm
    return _u8(y), _u8(cb), _u8(cr)


def to_yuv420(out_f32: jax.Array):
    """[H,W,3] float RGB in [0,255] -> (Y [H,W], Cb, Cr [H/2,W/2]) u8
    planes, JPEG full-range BT.601 with 2x2 box chroma subsampling."""
    r, g, b = out_f32[..., 0], out_f32[..., 1], out_f32[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    h, w = y.shape
    cbs = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    crs = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    return _u8(y), _u8(cbs), _u8(crs)
