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
    # Residual spectral limiter (``residual_limit``) — the round-5 fix for
    # the measured smooth-content texture hallucination (round-4 eval: sr-x2
    # -22.6 dB vs nearest on smooth gradients). The network's correction
    # over a tent (half-pel linear) upsample is split at a coarse spatial
    # cutoff (``limit_pool`` output pixels, box-pool + tent-up):
    #   - the LOW-frequency part passes through a soft-shrink deadband of
    #     ``limit_deadband`` levels: large global corrections (fade,
    #     vignette, brightness — tens of levels) lose only the deadband,
    #     while small-amplitude LF hallucination (blotch/shift, ~2-8 levels)
    #     is removed or strongly attenuated. A dead-zone-with-recovery
    #     variant was measured and rejected — the spurious blotch amplitudes
    #     overlap the recovery band and pass back through;
    #   - the HIGH-frequency part is clamped to +-(limit_floor +
    #     limit_quad * d^2) levels, d = excess curvature of the input luma:
    #     3x3-mean of max(|Laplacian| - limit_kappa*|grad|, 0), in levels.
    #     The kappa term zeroes d on coherent smooth gratings (|lap| ~
    #     (2*pi*f/N)*|grad| << |grad| for low f) while leaving noise
    #     (|lap| ~ 1.6|grad|) and real edges (|lap| ~ |grad|) saturating
    #     the bound open — denoise/deblur corrections are untouched, and
    #     hallucinated texture on ALL smooth content (flat or steep
    #     gradients) is clipped at the ~1-level floor.
    # Constants grid-tuned 2026-08-20 on the exact test metrics
    # (docs/measurements/r5/sr_limiter_grid.log): sr-x2 smooth test
    # 37.6 -> 49.4 dB (nearest 44.4), heldout rich 11.06 -> 11.34, photo
    # 3.94 -> 3.66, rich-clean -4.36 -> -1.18, eval smooth axis -21.3 ->
    # -14.9; sr-x4 rich-clean turns positive (+0.16), eval smooth -9.2 ->
    # -4.3. limit_pool = 0 disables; training runs disabled
    # (train/trainer.py) so optimization dynamics are unchanged.
    limit_pool: int = 32
    limit_deadband: float = 5.0  # levels (1/255)
    limit_floor: float = 1.0  # levels
    limit_quad: float = 0.2  # levels per squared-level of excess curvature
    limit_kappa: float = 0.7  # gradient discount in the curvature statistic


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


def _tent_kernel(scale: int) -> jnp.ndarray:
    """Triangle filter that turns a nearest (repeat) upsample into exact
    half-pel linear interpolation — the phase convention matching a
    ``scale x scale``-box downsample (sample centers at pixel centers)."""
    if scale == 2:
        return jnp.array([1.0, 2.0, 1.0]) / 4.0
    if scale == 4:
        return jnp.array([1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0]) / 16.0
    taps = jnp.concatenate(
        [jnp.arange(1, scale + 1, dtype=jnp.float32), jnp.arange(scale - 1, 0, -1, dtype=jnp.float32)]
    )
    return taps / float(scale * scale)


def upsample_tent(x: jax.Array, scale: int) -> jax.Array:
    """[N,H,W,C] -> [N,H*s,W*s,C] linear (tent) upsample, edge-replicated.

    Implemented as repeat + separable small-tap filter via shifted adds —
    pure VPU work that XLA fuses; no gather/resize custom call."""
    up = jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)
    k = _tent_kernel(scale).astype(x.dtype)
    r = (k.shape[0] - 1) // 2
    h, w = up.shape[1], up.shape[2]
    p = jnp.pad(up, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    up = sum(k[i] * p[:, i : i + h] for i in range(k.shape[0]))
    p = jnp.pad(up, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    return sum(k[i] * p[:, :, i : i + w] for i in range(k.shape[0]))


def local_detail(x: jax.Array, kappa: float = 0.0) -> jax.Array:
    """Per-pixel texture evidence of ``x`` [N,h,w,C] in [0,1] -> [N,h,w,1].

    3x3-mean of the EXCESS CURVATURE of luma (edge-replicated), in [0,1]
    luma units: max(|Laplacian| - kappa * |central gradient|, 0). With
    kappa=0 this is the plain |Laplacian| energy. Computed in f32 (tiny,
    1-channel); ~0 on flats, slow gradients, AND coherent low-frequency
    gratings; large on texture, edges, and noise."""
    xf = x.astype(jnp.float32)
    luma = xf @ jnp.array([0.299, 0.587, 0.114], jnp.float32)
    p = jnp.pad(luma, ((0, 0), (1, 1), (1, 1)), mode="edge")
    lap = jnp.abs(
        4.0 * luma - p[:, :-2, 1:-1] - p[:, 2:, 1:-1] - p[:, 1:-1, :-2] - p[:, 1:-1, 2:]
    )
    if kappa > 0.0:
        gx = jnp.abs(p[:, 1:-1, 2:] - p[:, 1:-1, :-2]) * 0.5
        gy = jnp.abs(p[:, 2:, 1:-1] - p[:, :-2, 1:-1]) * 0.5
        lap = jnp.maximum(lap - kappa * (gx + gy), 0.0)
    h, w = luma.shape[1], luma.shape[2]
    p = jnp.pad(lap, ((0, 0), (1, 1), (1, 1)), mode="edge")
    d = sum(p[:, i : i + h, j : j + w] for i in range(3) for j in range(3)) / 9.0
    return d[..., None]


def _lowpass(r: jax.Array, pool: int) -> jax.Array:
    """Coarse low-pass at a ``pool``-pixel cutoff: one box-pool, then
    ITERATED x2 tent-upsamples back (edge-padded to a pool multiple,
    cropped back). A direct ``upsample_tent(lo, pool)`` is a
    (2*pool - 1)-tap filter evaluated at full resolution — measured +0.7 s
    device time on the 2K->4K tiled SR program at pool=32 (bench family
    sr-x2-tiled-2048 warm 858 -> 1531 ms). The pyramid form does log2(pool)
    3-tap stages at geometrically growing sizes (~2x the full-res work of
    ONE 3-tap pass); the iterated-linear interpolant is an equally valid
    LF/HF split at the same cutoff scale, just slightly smoother."""
    assert pool & (pool - 1) == 0, f"limit_pool must be a power of 2, got {pool}"
    n, h, w, c = r.shape
    ph, pw = (-h) % pool, (-w) % pool
    rp = jnp.pad(r, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    lo = rp.reshape(n, (h + ph) // pool, pool, (w + pw) // pool, pool, c).mean(axis=(2, 4))
    s = pool
    while s > 1:
        lo = upsample_tent(lo, 2)
        s //= 2
    return lo[:, :h, :w]


def residual_limit(x: jax.Array, out: jax.Array, config: SRNetConfig) -> jax.Array:
    """Spectral residual limiter over the tent-upsample baseline.

    ``out -> tent + softshrink(LF(out - tent), deadband)
            + clamp(HF(out - tent), +-(floor + quad*d^2))``

    Pointwise-local in (x, out) with only fixed small-support filters, so
    applying it inside ``apply`` or outside a row-sharded wrapper of the
    unlimited network is the same function — the spatial program
    (serve/programs/sr.py) exploits that. See SRNetConfig for the design
    rationale and the measured axis movements."""
    c = config
    if c.limit_pool <= 0:
        return out
    # f32 throughout AND f32 out: bf16's ~0.5-level ulp at mid-gray would
    # re-quantize the carefully bounded residual envelope and measurably
    # breach the hallucination gate (measured: hf 1.03 in f32 vs 1.34 when
    # the limiter ran in bf16, gate 1.27). The limiter is the final model op,
    # so the f32 feeds straight into the program's egress cast.
    tent = upsample_tent(x.astype(jnp.float32), c.scale)
    r = out.astype(jnp.float32) - tent
    r_lf = _lowpass(r, c.limit_pool)
    r_hf = r - r_lf
    t = c.limit_deadband / 255.0
    r_lf = jnp.sign(r_lf) * jnp.maximum(jnp.abs(r_lf) - t, 0.0)
    d_l = upsample_tent(local_detail(x, c.limit_kappa), c.scale) * 255.0
    m = (c.limit_floor + c.limit_quad * d_l * d_l) * (1.0 / 255.0)
    return tent + r_lf + jnp.clip(r_hf, -m, m)


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
    bit-identical to the UNGATED ``apply`` body on the whole image — the
    exact spatial-parallel formulation for images too large for one device.
    The residual spectral limiter is NOT applied here: it is local in
    (input, output), so the spatial program (serve/programs/sr.py) applies
    ``residual_limit`` once on the gathered canvas instead of threading
    limiter halos through the shards."""
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
    return residual_limit(x, up + nn.upsample_nearest(x, c.scale), c)
