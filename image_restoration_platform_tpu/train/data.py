"""Synthetic degradation training data, generated entirely on device.

The restoration model learns the inverse of the classifier's taxonomy: clean
procedural images are degraded by simulable analogs of the seven degradation
types (blur / noise / lowLight / compression / scratch / fade / colorShift),
and the conditioning vector comes from running the *serving classifier* on
the degraded result (see synthetic_batch docstring). Everything is
jit-compiled: one device program produces (degraded, clean, cond) batches
with no host data loading.

This mirrors the reference's test-fixture philosophy (procedural generation,
imageFixtures.js:5-93) scaled up to a training distribution.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencil import gaussian_blur


@dataclass(frozen=True)
class DataConfig:
    size: int = 128
    channels: int = 3
    max_blur_sigma: float = 3.0
    max_noise_std: float = 0.15
    max_dark_gain: float = 0.75   # brightness multiplier reduction
    max_fade: float = 0.7
    max_shift: float = 0.25
    # rich natural-statistics generator (fractal octaves, edges, gratings,
    # text-like strokes, symmetric structure) vs the round-1 gradients+blobs
    rich: bool = True
    # fraction of examples kept fully clean (identity / no-harm training)
    clean_fraction: float = 0.15
    # photographic-physics round-3 distribution (OOD robustness, VERDICT r2
    # missing #2): adds flat/saturated geometric content families and
    # physical degradation variants (disk/motion PSF blur, signal-dependent
    # sensor noise, DCT-quantization compression, vignette+gamma low light)
    photo: bool = False
    # deconvolution emphasis (round-4, VERDICT r3 next #4): the round-3 model
    # recovered ~0 dB on OOD defocus/motion/jpeg because full-strength PSF
    # convolutions and deep DCT quantization were rare — PSF blur was
    # alpha-MIXED with the sharp image (residual high frequencies to copy)
    # and strength ~ U(0,1)*bernoulli(0.5) put most mass on mild damage.
    # With deconv=True (requires photo=True): (a) blur/compression strengths
    # draw a strong tail (40% of active draws resample to [0.7, 1.0]),
    # (b) PSF blur reaches full convolution at strength >= 0.6 instead of
    # only at 1.0, (c) the PSF bank is densified (5 disk radii, 5 motion
    # lengths x 8 angles) so continuous eval kernels interpolate, (d) the
    # real-DCT JPEG variant fires at 75% instead of 50%.
    deconv: bool = False
    # aperiodic photographic micro-texture cleans (round-4): the first
    # real-photo evaluation (train/realphoto.py) measured 9-14/255 clean harm
    # on grain/tile/marble/grass content — the classifier scores aperiodic
    # micro-texture noise~1.0 + compression high, and training cleans only
    # ever carried PERIODIC texture (dots/stripes), so the model smooths
    # stochastic texture away. grain=True mixes a band-pass filtered-noise
    # texture family (anisotropic correlated grain over smooth bases —
    # construction disjoint from both train and OOD generators) into the
    # photo clean mix so "conditioning says noise, target says preserve"
    # covers the aperiodic case too.
    grain: bool = False
    # smooth-gradient cleans (round-4): the SR families hallucinated texture
    # into texture-FREE content (smooth sky/bokeh-like surfaces: 24 dB vs
    # nearest-neighbor's 44 dB, 5x the true Laplacian energy) because no
    # clean family was ever purely smooth — flat scenes carry hard edges,
    # everything else carries detail, so "sharpen everything" was never
    # penalised. smooth=True carves a ~10% share of bilinearly-upsampled
    # random control grids + linear color ramps (no energy above ~4
    # cycles/image; construction-disjoint from the cosine-grating smooth
    # eval in tests/test_quality.py) out of the rich slice.
    smooth: bool = False
    # share of the clean mix the smooth family takes when smooth=True. The
    # default 10% moved sr-x2 from 24 -> 38 dB on smooth eval content but
    # left it short of nearest-parity (44 dB); smooth-heavy top-up phases
    # raise this. Capped at 0.28 — the interval [0.62, 0.62+share) is carved
    # out of the rich slice, and the rich family must keep >= a 10% share
    # (u in [0.90, 1.0)) or the in-distribution gain gates starve.
    smooth_share: float = 0.10
    # compression-solo emphasis (round-5): with independent bernoulli-0.5
    # activation per channel, "JPEG and nothing else" is ~0.8% of examples
    # (0.5 * 0.5^6), so the backbone never learned the compression-dominant
    # regime — measured: it HARMS jpeg-only inputs by ~-1 dB e2e even with
    # the deblocking stage (docs/STATUS.md round-4, real corpus -1.38 dB).
    # compression_solo forces that fraction of examples to a
    # compression-ONLY active mask (strength still uniform, near-clean band
    # still applies) and pins them to the real-DCT JPEG analog, so
    # "deblock + ring-repair, change nothing else" becomes a common task.
    compression_solo: float = 0.0
    # low-light-solo counterweight (2026-08-20): a compression_solo share
    # displaces every other channel's coverage uniformly; the first axis to
    # drift on chunked flagship top-ups was ood/vignette_low_light
    # (13.19 -> 12.22 dB after one 4000-step chunk at comp_solo=0.3).
    # lowlight_solo forces this fraction to a lowLight-only active mask so
    # the brighten+denoise regime keeps its sampling density.
    lowlight_solo: float = 0.0


def _random_clean(key, n, size, channels):
    """Procedural 'natural-ish' clean images: mixtures of smooth gradients,
    gaussian blobs and a little texture, in [0, 1]."""
    k1, k1b, k2, k3, k4 = jax.random.split(key, 5)
    yy = jnp.linspace(0.0, 1.0, size)[None, :, None, None]
    xx = jnp.linspace(0.0, 1.0, size)[None, None, :, None]

    a = jax.random.uniform(k1, (n, 1, 1, channels))
    b = jax.random.uniform(k1b, (n, 1, 1, channels))
    base = a * yy + b * xx

    # gaussian blobs
    centers = jax.random.uniform(k2, (n, 4, 2))
    amps = jax.random.uniform(k3, (n, 4, channels), minval=-0.5, maxval=0.8)
    widths = jax.random.uniform(k4, (n, 4, 1), minval=0.05, maxval=0.3)
    yy_b = jnp.linspace(0.0, 1.0, size)[None, None, :, None]
    xx_b = jnp.linspace(0.0, 1.0, size)[None, None, None, :]
    d2 = (yy_b - centers[:, :, 0:1, None]) ** 2 + (xx_b - centers[:, :, 1:2, None]) ** 2
    blobs = jnp.einsum(
        "nbhw,nbc->nhwc", jnp.exp(-d2 / (2 * widths[:, :, :, None] ** 2 + 1e-4)), amps
    )
    img = base * 0.5 + 0.4 + blobs * 0.4
    # faint texture: clean photos have LOW high-pass energy — the reference's
    # noise score is highpass-std/50, and a clean image must not saturate it
    noise_key = jax.random.fold_in(key, 7)
    texture = jax.random.uniform(noise_key, (n, size, size, channels), minval=-0.025, maxval=0.025)
    return jnp.clip(img + texture, 0.0, 1.0)


def _fractal_noise(key, n, size, channels):
    """Multi-octave value noise with a random per-image spectral slope —
    the 1/f^beta power spectrum of natural photographs (the round-1 flat
    'clean' images scored unrealistically high on the variance heuristics,
    VERDICT round-1 weak #3)."""
    keys = jax.random.split(key, 8)
    beta = jax.random.uniform(keys[7], (n, 1, 1, 1), minval=1.0, maxval=1.6)
    total = None
    octave, i = 4, 0
    # stop at size/2: the finest octave is pixel-level white noise, which
    # reads as degradation (highpass-std) rather than clean photo texture
    while octave <= size // 2:
        g = jax.random.normal(keys[i % 7], (n, octave, octave, channels))
        up = jax.image.resize(g, (n, size, size, channels), "linear")
        amp = (4.0 / octave) ** beta
        total = up * amp if total is None else total + up * amp
        octave *= 2
        i += 1
    return total


def _soft_shapes(key, n, size, channels, k=4):
    """Random soft-edged rectangles/ellipses: flat regions bounded by real
    edges (the structures libvips-style Laplacian scores respond to)."""
    ks = jax.random.split(key, 6)
    yy = jnp.linspace(0.0, 1.0, size)[None, None, :, None]
    xx = jnp.linspace(0.0, 1.0, size)[None, None, None, :]
    cy = jax.random.uniform(ks[0], (n, k, 1, 1), minval=0.1, maxval=0.9)
    cx = jax.random.uniform(ks[1], (n, k, 1, 1), minval=0.1, maxval=0.9)
    hh = jax.random.uniform(ks[2], (n, k, 1, 1), minval=0.05, maxval=0.35)
    ww = jax.random.uniform(ks[3], (n, k, 1, 1), minval=0.05, maxval=0.35)
    sharp = 80.0
    rect = jax.nn.sigmoid((hh - jnp.abs(yy - cy)) * sharp) * jax.nn.sigmoid(
        (ww - jnp.abs(xx - cx)) * sharp
    )
    ell = jax.nn.sigmoid(
        (1.0 - jnp.square((yy - cy) / hh) - jnp.square((xx - cx) / ww)) * 10.0
    )
    is_ellipse = jax.random.bernoulli(ks[4], 0.5, (n, k, 1, 1))
    mask = jnp.where(is_ellipse, ell, rect)  # [n, k, h, w]
    colors = jax.random.uniform(ks[5], (n, k, 1, 1, channels), minval=-0.6, maxval=0.6)
    return jnp.sum(mask[..., None] * colors, axis=1)


def _gratings(key, n, size):
    """Localized oriented sinusoid (fabric/wood-grain texture)."""
    ks = jax.random.split(key, 6)
    theta = jax.random.uniform(ks[0], (n, 1, 1, 1), maxval=jnp.pi)
    freq = jax.random.uniform(ks[1], (n, 1, 1, 1), minval=2.0, maxval=24.0)
    phase = jax.random.uniform(ks[2], (n, 1, 1, 1), maxval=2.0 * jnp.pi)
    amp = jax.random.uniform(ks[3], (n, 1, 1, 1), maxval=0.18)
    yy = jnp.linspace(0.0, 1.0, size)[None, :, None, None]
    xx = jnp.linspace(0.0, 1.0, size)[None, None, :, None]
    wave = jnp.sin(2.0 * jnp.pi * freq * (xx * jnp.cos(theta) + yy * jnp.sin(theta)) + phase)
    cy = jax.random.uniform(ks[4], (n, 1, 1, 1))
    cx = jax.random.uniform(ks[5], (n, 1, 1, 1))
    d2 = jnp.square(yy - cy) + jnp.square(xx - cx)
    return wave * amp * jnp.exp(-d2 / 0.12)


def _strokes(key, n, size, m=6):
    """Thin high-contrast segments — text/wire-like content, so the model
    learns that sharp thin lines can be *content*, not always scratches."""
    ks = jax.random.split(key, 5)
    rows = jnp.arange(size, dtype=jnp.float32)[None, None, :, None]
    cols = jnp.arange(size, dtype=jnp.float32)[None, None, None, :]
    x0 = jax.random.uniform(ks[0], (n, m, 1, 1), maxval=float(size))
    y0 = jax.random.uniform(ks[1], (n, m, 1, 1), maxval=float(size))
    ang = jax.random.uniform(ks[2], (n, m, 1, 1), maxval=jnp.pi)
    length = jax.random.uniform(ks[3], (n, m, 1, 1), minval=size * 0.05, maxval=size * 0.3)
    amp = jax.random.uniform(ks[4], (n, m, 1, 1), minval=-0.5, maxval=0.5)
    dx = cols - x0
    dy = rows - y0
    t = dx * jnp.cos(ang) + dy * jnp.sin(ang)
    dperp = -dx * jnp.sin(ang) + dy * jnp.cos(ang)
    line = (
        jnp.exp(-jnp.abs(dperp) * 1.5)
        * jax.nn.sigmoid(t * 2.0)
        * jax.nn.sigmoid((length - t) * 2.0)
    )
    return jnp.sum(line * amp, axis=1)[..., None]


def _random_clean_rich(key, n, size, channels):
    """Natural-statistics procedural clean images: gradients+blobs backbone,
    1/f fractal texture, soft-edged shapes, localized gratings, text-like
    strokes, occasional mirror symmetry (face-like bilateral structure),
    finished with random gamma and white balance."""
    ks = jax.random.split(key, 9)
    base = _random_clean(ks[0], n, size, channels)
    fract = _fractal_noise(ks[1], n, size, channels)
    shapes = _soft_shapes(ks[2], n, size, channels)
    grat = _gratings(ks[3], n, size)
    strokes = _strokes(ks[4], n, size)

    w = jax.random.uniform(ks[5], (n, 4, 1, 1, 1))
    img = (
        base
        + 0.16 * w[:, 0] * fract
        + 0.8 * w[:, 1] * shapes
        + w[:, 2] * grat
        + w[:, 3] * strokes
    )
    sym = jax.random.bernoulli(ks[6], 0.2, (n, 1, 1, 1))
    img = jnp.where(sym, 0.5 * img + 0.5 * img[:, :, ::-1, :], img)

    gamma = jax.random.uniform(ks[7], (n, 1, 1, 1), minval=0.7, maxval=1.4)
    wb = jax.random.uniform(ks[8], (n, 1, 1, channels), minval=0.92, maxval=1.08)
    img = jnp.power(jnp.clip(img, 0.0, 1.0), gamma) * wb
    return jnp.clip(img, 0.0, 1.0)


def _flat_scene(key, n, size, channels):
    """Opaque layered rectangles/ellipses with flat saturated colors over a
    two-color ramp — poster/architectural statistics: large constant regions
    meeting at sharp boundaries. The round-2 model collapsed on exactly this
    content (scored blur~1/colorShift~1, then 'corrected' a clean image);
    training must contain it paired with identity targets."""
    ks = jax.random.split(key, 4)
    yy = jnp.linspace(0.0, 1.0, size)[None, :, None, None]
    xx = jnp.linspace(0.0, 1.0, size)[None, None, :, None]
    c0 = jax.random.uniform(ks[0], (n, 1, 1, channels), minval=0.05, maxval=0.95)
    c1 = jax.random.uniform(ks[1], (n, 1, 1, channels), minval=0.05, maxval=0.95)
    img = c0 * (1.0 - yy) + c1 * yy
    layers = 6
    lk = jax.random.split(ks[2], layers)
    sharp = 60.0  # ~half-pixel anti-aliased edge at 128px
    for i in range(layers):
        p = jax.random.uniform(lk[i], (n, 9))
        cy, cx = 0.1 + 0.8 * p[:, 0], 0.1 + 0.8 * p[:, 1]
        hh, ww = 0.05 + 0.3 * p[:, 2], 0.05 + 0.3 * p[:, 3]
        rect = jax.nn.sigmoid(
            (hh[:, None, None, None] - jnp.abs(yy - cy[:, None, None, None])) * sharp
        ) * jax.nn.sigmoid(
            (ww[:, None, None, None] - jnp.abs(xx - cx[:, None, None, None])) * sharp
        )
        ell = jax.nn.sigmoid(
            (
                1.0
                - jnp.square((yy - cy[:, None, None, None]) / hh[:, None, None, None])
                - jnp.square((xx - cx[:, None, None, None]) / ww[:, None, None, None])
            )
            * 14.0
        )
        mask = jnp.where(p[:, 4][:, None, None, None] < 0.5, ell, rect)
        color = p[:, 5:8][:, None, None, :] * 0.9 + 0.05
        alpha = (0.6 + 0.4 * p[:, 8])[:, None, None, None]
        img = img * (1.0 - mask * alpha) + color * mask * alpha
    return jnp.clip(img, 0.0, 1.0)


def _soft_cells(key, n, size, channels, k=10):
    """Soft nearest-center cell mosaic (softmax membership over k centers):
    near-flat curved regions with a coherent saturated palette — the jax
    counterpart of stained-glass content, constructed differently from the
    numpy argmin-Voronoi OOD *eval* generator (train/ood.py stays disjoint)."""
    ks = jax.random.split(key, 4)
    centers = jax.random.uniform(ks[0], (n, k, 2))
    # palette along a smooth random curve in RGB (coherent color scheme)
    base = jax.random.uniform(ks[1], (n, 1, 3), minval=0.15, maxval=0.85)
    direction = jax.random.normal(ks[2], (n, 1, 3))
    direction = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-9)
    t = jnp.linspace(-0.5, 0.5, k)[None, :, None]
    wobble = 0.1 * jax.random.normal(ks[3], (n, k, 3))
    colors = jnp.clip(base + t * direction * 0.7 + wobble, 0.03, 0.97)
    yy = jnp.linspace(0.0, 1.0, size)[None, None, :, None]
    xx = jnp.linspace(0.0, 1.0, size)[None, None, None, :]
    d2 = jnp.square(yy - centers[:, :, 0:1, None]) + jnp.square(
        xx - centers[:, :, 1:2, None]
    )  # [n, k, h, w]
    w = jax.nn.softmax(-d2 * 220.0, axis=1)  # sharp-but-AA cell boundaries
    img = jnp.einsum("nkhw,nkc->nhwc", w, colors)
    shade = 1.0 - 0.2 * jnp.sqrt(jnp.sum(w * d2, axis=1))[..., None]
    return jnp.clip(img * shade, 0.0, 1.0)


def _periodic_texture(key, n, size, channels):
    """Dense periodic texture: oriented dot lattices and crossed square-wave
    weaves (fabric / halftone print / brick statistics). Round-3 OOD eval
    found the model DESTROYS such content (-5.7 dB on jpeg'd halftones,
    20/255 mean harm on clean weaves): dense high-frequency structure never
    appeared clean in training, so it reads as noise/scratch and gets
    smoothed away. Real photographs are full of it.

    Construction is deliberately different from the numpy OOD generators
    (train/ood.py _halftone_clean/_weave_clean): soft-threshold lattices on
    rotated coordinates with random duty/softness/palette, not the eval's
    sigmoid dots / sign waves; eval seeds stay disjoint."""
    ks = jax.random.split(key, 10)
    yy = jnp.linspace(0.0, 1.0, size)[None, :, None, None] * size
    xx = jnp.linspace(0.0, 1.0, size)[None, None, :, None] * size
    ang = jax.random.uniform(ks[0], (n, 1, 1, 1), maxval=jnp.pi)
    period = jax.random.uniform(ks[1], (n, 1, 1, 1), minval=3.0, maxval=9.0)
    u = (xx * jnp.cos(ang) + yy * jnp.sin(ang)) / period
    v = (-xx * jnp.sin(ang) + yy * jnp.cos(ang)) / period
    soft = jax.random.uniform(ks[2], (n, 1, 1, 1), minval=4.0, maxval=12.0)
    duty = jax.random.uniform(ks[3], (n, 1, 1, 1), minval=-0.3, maxval=0.3)
    # lattice field: product of two phase-offset cosines -> dots; a single
    # cosine -> stripes; blend per image
    dots = jnp.tanh((jnp.cos(2 * jnp.pi * u) * jnp.cos(2 * jnp.pi * v) + duty) * soft)
    stripes = jnp.tanh((jnp.cos(2 * jnp.pi * u) + duty) * soft)
    w_dot = jax.random.uniform(ks[4], (n, 1, 1, 1))
    field = jnp.where(w_dot < 0.5, dots, stripes) * 0.5 + 0.5  # [0,1]
    c0 = jax.random.uniform(ks[5], (n, 1, 1, channels), minval=0.05, maxval=0.95)
    c1 = jax.random.uniform(ks[6], (n, 1, 1, channels), minval=0.05, maxval=0.95)
    img = c0 * field + c1 * (1.0 - field)
    # slow illumination ramp + occasional large-scale mask so texture appears
    # as a REGION of a photo, not always full-frame
    gdir = jax.random.normal(ks[7], (n, 2, 1, 1, 1))
    ramp = (yy[:, :, :, :] * gdir[:, 0] + xx * gdir[:, 1]) / size
    img = img * (1.0 + 0.25 * jnp.tanh(ramp))
    partial = jax.random.bernoulli(ks[8], 0.4, (n, 1, 1, 1))
    cy = jax.random.uniform(ks[9], (n, 1, 1, 1))
    mask = jax.nn.sigmoid((yy / size - cy) * 30.0)
    base = _random_clean(jax.random.fold_in(key, 31), n, size, channels)
    img = jnp.where(partial, img * mask + base * (1.0 - mask), img)
    return jnp.clip(img, 0.0, 1.0)


def _grain_texture(key, n, size, channels):
    """Aperiodic photographic micro-texture: anisotropically correlated
    band-pass noise riding a smooth base — the statistics of grass, fabric,
    stone grain, sensor noise baked into content. Round-4 real-photo eval
    (train/realphoto.py) measured 9-14/255 clean harm exactly on such
    content; the periodic-texture family covers lattices but nothing
    stochastic.

    Construction (disjoint from OOD's numpy generators and from the additive
    iid noise DEGRADATION, which is what the model must still remove): white
    noise is correlated by a per-image random blend of directional 3x3
    smoothing kernels and band-passed by subtracting a wider smooth, giving
    spatially-correlated, anisotropic texture; a coarser half-resolution
    octave adds clumping. The degradation pipeline later adds *iid* noise on
    top — separable from this correlated texture, so the task stays
    well-posed."""
    ks = jax.random.split(key, 8)
    base = _random_clean(ks[0], n, size, channels)

    def correlated(key_n, s):
        noise = jax.random.normal(key_n, (n, 1, s, s))
        # directional smoothing bank: iso / horizontal / vertical / diagonal;
        # convolve once per bank kernel (shared weights), blend per image —
        # one [4,1,3,3] conv instead of per-image kernels
        k_iso = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16
        k_h = jnp.asarray([[0, 0, 0], [1, 2, 1], [0, 0, 0]], jnp.float32) / 4
        k_v = k_h.T
        k_d = jnp.eye(3, dtype=jnp.float32) / 3
        bank = jnp.stack([k_iso, k_h, k_v, k_d])[:, None]  # [4,1,3,3]
        dn = ("NCHW", "OIHW", "NCHW")
        smooth4 = jax.lax.conv_general_dilated(
            noise, bank, (1, 1), "SAME", dimension_numbers=dn
        )  # [n,4,s,s]
        w = jax.random.dirichlet(jax.random.fold_in(key_n, 1), jnp.ones(4), (n,))
        smooth = jnp.einsum("nkhw,nk->nhw", smooth4, w)[:, None]  # [n,1,s,s]
        # band-pass: remove the local DC the smoothing kept
        box = jnp.full((1, 1, 3, 3), 1.0 / 9.0)
        wide = jax.lax.conv_general_dilated(
            smooth, box, (1, 1), "SAME", dimension_numbers=dn
        )
        return jnp.transpose(smooth - wide, (0, 2, 3, 1))  # [n,s,s,1]

    fine = correlated(ks[1], size)
    coarse = correlated(ks[2], (size + 1) // 2)
    coarse = jnp.repeat(jnp.repeat(coarse, 2, axis=1), 2, axis=2)[:, :size, :size]
    octave_w = jax.random.uniform(ks[3], (n, 1, 1, 1), minval=0.2, maxval=0.8)
    g = fine * (1.0 - octave_w) + coarse * octave_w
    g = g / (jnp.std(g, axis=(1, 2, 3), keepdims=True) + 1e-6)
    amp = jax.random.uniform(ks[4], (n, 1, 1, 1), minval=0.02, maxval=0.12)
    # mostly-luma grain with a small independent chroma component, amplitude
    # coupled to local luminance (shadows grain less than mids, like film)
    chroma = 0.25 * jax.random.normal(ks[5], (n, size, size, channels)) * jnp.abs(g)
    lum_couple = 0.3 + 0.7 * base
    img = base + (g + chroma) * amp * lum_couple
    # occasional partial coverage: texture as a region of a photo
    partial = jax.random.bernoulli(ks[6], 0.3, (n, 1, 1, 1))
    yy = jnp.linspace(0.0, 1.0, size)[None, :, None, None]
    cy = jax.random.uniform(ks[7], (n, 1, 1, 1))
    mask = jax.nn.sigmoid((yy - cy) * 25.0)
    img = jnp.where(partial, img * mask + base * (1.0 - mask), img)
    return jnp.clip(img, 0.0, 1.0)


def _smooth_scene(key, n, size, channels):
    """Sky/bokeh-like smooth surfaces: random low-resolution control grids
    (4x4 and 8x8, bilinearly upsampled — piecewise-linear, nothing above ~4
    cycles/image) blended with a linear two-color ramp at a random angle.
    Construction-disjoint from the smooth EVAL generator (cosine gratings +
    radial gradient, tests/test_quality.py::_smooth_batch)."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    g4 = jax.random.uniform(k1, (n, 4, 4, channels))
    g8 = jax.random.uniform(k2, (n, 8, 8, channels))
    up4 = jax.image.resize(g4, (n, size, size, channels), "linear")
    up8 = jax.image.resize(g8, (n, size, size, channels), "linear")
    w = jax.random.uniform(k3, (n, 1, 1, 1))
    grid = up4 * w + up8 * (1.0 - w)
    c0 = jax.random.uniform(k4, (n, 1, 1, channels))
    c1 = jax.random.uniform(k5, (n, 1, 1, channels))
    theta = jax.random.uniform(k6, (n, 1, 1, 1), maxval=2.0 * jnp.pi)
    yy, xx = jnp.mgrid[0:size, 0:size]
    coord = (xx[None, :, :, None] * jnp.cos(theta) + yy[None, :, :, None] * jnp.sin(theta)) / size
    t = jnp.clip((coord + 1.0) * 0.5, 0.0, 1.0)
    ramp = c0 + (c1 - c0) * t
    mix = jax.random.uniform(k7, (n, 1, 1, 1), minval=0.35, maxval=0.85)
    return jnp.clip(grid * mix + ramp * (1.0 - mix), 0.0, 1.0)


def _clean_photo_mix(key, n, size, channels, grain=False, smooth=False, smooth_share=0.10):
    """Round-3 clean distribution: rich natural-statistics images plus the
    flat/saturated geometric families the round-2 model had never seen,
    finished with creative-grade augmentation (low-key exposure, matte
    blacks, desaturation) with identity targets.

    Returns ``(img, aug)`` where ``aug`` is a per-image [n, 1] float flag
    marking images that received any creative grade.

    The augmentation is the harm-bounding half of the OOD fix: a dark,
    low-contrast or desaturated image scores fade~1/colorShift~1 on the
    heuristic classifier, and a model that never saw such content CLEAN
    learns 'fade cond -> stretch toward bright mid-gray' and brightens a
    clean dark photo by +80/255. BUT the creative grades must stay
    *distinguishable from damage*, or the restoration target becomes
    ambiguous and the learned conditional mean collapses the +dB gain (the
    phase-B retrain measured exactly that: a linear exposure multiplier is
    pixel-identical to the lowLight degradation's gain, so 'dark' carried
    two conflicting targets). The physical distinction real photographs
    offer: creative grades preserve true highlights (a low-key photo keeps
    its speculars; matte lifts blacks without pulling highlights down),
    while damage crushes or shifts the full range. Hence: exposure is a
    shadow-crushing tone curve with y(1)=1, matte is a lifted black point,
    and the ambiguous degradations are gated off augmented images in
    _degrade (see the ``protect`` argument)."""
    k0, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    rich = _random_clean_rich(k0, n, size, channels)
    flat = _flat_scene(k1, n, size, channels)
    cells = _soft_cells(k2, n, size, channels)
    tex = _periodic_texture(k5, n, size, channels)
    u = jax.random.uniform(k3, (n, 1, 1, 1))
    img = jnp.where(
        u < 0.18,
        flat,
        jnp.where(u < 0.33, cells, jnp.where(u < 0.47, tex, rich)),
    )
    if grain:
        # round-4: aperiodic micro-texture cleans take a 15% share, carved
        # from the rich slice (u in [0.47, 0.62)); see DataConfig.grain
        gtex = _grain_texture(jax.random.fold_in(key, 33), n, size, channels)
        img = jnp.where((u >= 0.47) & (u < 0.62), gtex, img)
    if smooth:
        # round-4: texture-free smooth surfaces take a configurable share
        # (default 10%) carved from the rich slice, u in [0.62, 0.62+share);
        # see DataConfig.smooth / smooth_share
        share = min(max(float(smooth_share), 0.0), 0.28)
        sm = _smooth_scene(jax.random.fold_in(key, 44), n, size, channels)
        img = jnp.where((u >= 0.62) & (u < 0.62 + share), sm, img)

    ka, kb, kc, kd, ke, kf = jax.random.split(k4, 6)
    # low-key exposure: crush shadows/mids, keep true highlights (y(1)=1).
    # The lowLight *degradation* is a global gain that scales highlights
    # away — the surviving speculars are what make this grade recoverable
    # as a creative choice rather than damage.
    on_e = jax.random.bernoulli(ka, 0.2, (n, 1, 1, 1))
    e = jnp.where(on_e, jax.random.uniform(kb, (n, 1, 1, 1), minval=0.2, maxval=0.75), 1.0)
    img = img * (e + (1.0 - e) * jnp.square(img) * img)
    # matte look: lifted black point, highlights intact (the fade
    # degradation pulls highlights toward mid-gray too)
    on_m = jax.random.bernoulli(kc, 0.15, (n, 1, 1, 1))
    lo = jnp.where(on_m, jax.random.uniform(kd, (n, 1, 1, 1), maxval=0.18), 0.0)
    img = lo + (1.0 - lo) * img
    # desaturation: muted/monochrome palettes are a grade, not a cast
    on_d = jax.random.bernoulli(ke, 0.15, (n, 1, 1, 1))
    dfrac = jnp.where(on_d, jax.random.uniform(kf, (n, 1, 1, 1), minval=0.2, maxval=1.0), 1.0)
    gray = img.mean(axis=-1, keepdims=True)
    img = gray + (img - gray) * dfrac
    aug = (on_e | on_m | on_d).astype(jnp.float32)[:, 0, 0, :]
    return jnp.clip(img, 0.0, 1.0), aug


# ------------------------------------------------- photographic degradations


def _build_psf_bank(
    ksize: int = 15,
    radii=(1.5, 2.5, 3.5),
    lengths=(5.0, 9.0, 13.0),
    angles=(0.0, np.pi / 4, np.pi / 2, 3 * np.pi / 4),
) -> np.ndarray:
    """Static kernel bank: disk-defocus PSFs (hard-edged frequency response
    with nulls) and motion-line PSFs — optics the training Gaussian never
    produced."""
    kernels = []
    r0 = ksize // 2
    yy, xx = np.mgrid[-r0 : r0 + 1, -r0 : r0 + 1].astype(np.float32)
    for radius in radii:
        psf = np.clip(radius + 0.5 - np.sqrt(yy**2 + xx**2), 0.0, 1.0)
        kernels.append(psf / psf.sum())
    for length in lengths:
        for ang in angles:
            t = xx * np.cos(ang) + yy * np.sin(ang)
            dperp = -xx * np.sin(ang) + yy * np.cos(ang)
            psf = np.clip(1.0 - np.abs(dperp), 0, 1) * (np.abs(t) <= length / 2)
            kernels.append(psf / psf.sum())
    return np.stack(kernels).astype(np.float32)  # [len(radii)+len(lengths)*len(angles), k, k]


_PSF_BANK = jnp.asarray(_build_psf_bank())
# densified bank for the deconv distribution: continuous-parameter eval
# kernels (train/ood.py draws radius~U(1.5,3.5), angle~U(0,pi)) land close
# to SOME bank member, so deconvolution generalizes instead of keying on
# 15 memorized kernels
_PSF_BANK_RICH = jnp.asarray(
    _build_psf_bank(
        radii=(1.5, 2.0, 2.5, 3.0, 3.5),
        lengths=(5.0, 7.0, 9.0, 11.0, 13.0),
        angles=tuple(np.pi * i / 8 for i in range(8)),
    )
)


def _psf_blur(x, idx, strength, bank=None):
    """Per-image PSF blur from the bank, mixed by strength (a partial mix
    models the haze of slight defocus).

    Edge-replicate padding, NOT zero-pad SAME: zero padding darkens a
    kernel-radius rim, and a round-4 ablation showed the deconv-trained
    model's entire measured "deblur gain" (+4.5 dB full-frame) was rim
    repair — interior-only gain was +0.04 dB. A real out-of-frame scene
    continues (gaussian_blur in ops/stencil.py already replicates); with the
    rim shortcut removed the objective can only be satisfied by actual
    interior deconvolution."""
    kernels = (_PSF_BANK if bank is None else bank)[idx]  # [n, kh, kw]
    r = int((_PSF_BANK if bank is None else bank).shape[-1]) // 2

    def one(im, ker):
        im_p = jnp.pad(im, ((r, r), (r, r), (0, 0)), mode="edge")
        im_c = jnp.transpose(im_p, (2, 0, 1))[:, None]  # [C,1,H+2r,W+2r]
        out = jax.lax.conv_general_dilated(im_c, ker[None, None], (1, 1), "VALID")
        return jnp.transpose(out[:, 0], (1, 2, 0))

    blurred = jax.vmap(one)(x, kernels)
    s = strength[:, None, None, None]
    return x * (1.0 - s) + blurred * s


def _signal_noise(key, x, strength):
    """Poisson-Gaussian sensor model (Gaussian approximation of shot noise):
    variance = a*intensity + b, vs the training AWGN's flat variance."""
    a = jnp.square(strength * 0.13)[:, None, None, None]
    b = jnp.square(strength * 0.04)[:, None, None, None]
    std = jnp.sqrt(a * jnp.clip(x, 0.0, 1.0) + b)
    return x + jax.random.normal(key, x.shape) * std


def _vignette_dark(x, strength):
    """Radial vignette + gamma crush — spatially varying underexposure vs the
    training low-light's uniform linear gain."""
    size = x.shape[1]
    yy = jnp.linspace(-1.0, 1.0, size)[None, :, None, None]
    xx = jnp.linspace(-1.0, 1.0, size)[None, None, :, None]
    r2 = yy * yy + xx * xx
    s = strength[:, None, None, None]
    vig = jnp.clip(1.0 - 0.45 * s * r2, 0.0, 1.0)
    gamma = 1.0 + 1.1 * s
    return jnp.power(jnp.clip(x * vig, 1e-6, 1.0), gamma)


# standard JPEG annex-K quantization tables
_JPEG_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_JPEG_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _dct8_matrix() -> np.ndarray:
    k = np.arange(8)[:, None].astype(np.float32)
    i = np.arange(8)[None, :].astype(np.float32)
    m = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * i + 1) * k / 16.0)
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


_DCT8 = jnp.asarray(_dct8_matrix())


def _quant_channel(v, table, qscale):
    """8x8 block DCT quantize/dequantize one channel. v [N,H,W] in [-128,127];
    qscale [N] is the JPEG quality scale factor."""
    n, h, w = v.shape
    blocks = v.reshape(n, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    coef = jnp.einsum("ab,nijbc,dc->nijad", _DCT8, blocks, _DCT8)
    qt = jnp.clip(table[None, None, None] * qscale[:, None, None, None, None], 1.0, 255.0)
    qc = jnp.round(coef / qt) * qt
    rec = jnp.einsum("ba,nijbc,cd->nijad", _DCT8, qc, _DCT8)
    return rec.transpose(0, 1, 3, 2, 4).reshape(n, h, w)


def _jpeg_analog(x, strength):
    """Real-DCT compression model: YCbCr transform, 2x2 chroma subsampling,
    annex-K table quantization at quality 92 -> 12 as strength rises — true
    ringing/blocking spectra, vs the round-1/2 8x8 block-average analog."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5

    q = 92.0 - 80.0 * strength  # JPEG quality in [12, 92]
    qscale = jnp.where(q < 50.0, 50.0 / q, 2.0 - q / 50.0)

    y_q = _quant_channel(y * 255.0 - 128.0, _JPEG_LUMA, qscale)
    # chroma: 2x2 subsample -> quantize -> upsample (4:2:0)
    n, h, w = cb.shape

    def sub(ch):
        return ch.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def up(ch):
        return jnp.repeat(jnp.repeat(ch, 2, axis=1), 2, axis=2)

    cb_q = up(_quant_channel(sub(cb) * 255.0 - 128.0, _JPEG_CHROMA, qscale))
    cr_q = up(_quant_channel(sub(cr) * 255.0 - 128.0, _JPEG_CHROMA, qscale))

    y2 = (y_q + 128.0) / 255.0
    cb2 = (cb_q + 128.0) / 255.0 - 0.5
    cr2 = (cr_q + 128.0) / 255.0 - 0.5
    r2 = y2 + cr2 / 0.713
    b2 = y2 + cb2 / 0.564
    g2 = (y2 - 0.299 * r2 - 0.114 * b2) / 0.587
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1), 0.0, 1.0)


def _degrade(key, clean, cfg: DataConfig, protect=None):
    """Apply random degradations; returns (degraded, applied strengths [N,7]).

    ``protect`` ([N, 1] float, optional) marks creatively-graded clean images
    (dark/matte/muted with identity targets, _clean_photo_mix). For those the
    brightness/color-ambiguous degradations — lowLight, fade, colorShift —
    are gated OFF: stacking a gain reduction on an intentionally dark target
    would make the ground truth unrecoverable from the input and teach the
    model a collapsed conditional mean (measured: held-out gain fell from
    +17 dB to +4.7 dB when the phase-B augmentation stacked them). Blur,
    noise, compression and scratch stay active on graded images: they leave
    the target's brightness observable in the input."""
    n = clean.shape[0]
    keys = jax.random.split(key, 10)
    # which degradations are active (bernoulli 0.5 each); 10% of examples are
    # kept fully clean so the model learns the identity on good inputs
    # (the reference's "good condition -> subtle enhancements only" contract)
    active = jax.random.bernoulli(keys[0], 0.5, (n, 7)).astype(jnp.float32)
    solo = jnp.zeros((n, 1), jnp.float32)
    if cfg.compression_solo > 0.0:
        # compression-dominant emphasis: force a compression-only mask for
        # this fraction so the jpeg-only regime stops being a 0.8% tail
        solo = jax.random.bernoulli(
            jax.random.fold_in(key, 41), cfg.compression_solo, (n, 1)
        ).astype(jnp.float32)
        comp_only = jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])[None, :]
        active = active * (1.0 - solo) + comp_only * solo
    if cfg.lowlight_solo > 0.0:
        # low-light-only counterweight rows; drawn independently, and comp
        # wins ties so the jpeg-only share stays exactly compression_solo
        ll = jax.random.bernoulli(
            jax.random.fold_in(key, 43), cfg.lowlight_solo, (n, 1)
        ).astype(jnp.float32) * (1.0 - solo)
        ll_only = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0])[None, :]
        active = active * (1.0 - ll) + ll_only * ll
    keep_clean = jax.random.bernoulli(keys[6], cfg.clean_fraction, (n, 1)).astype(jnp.float32)
    # a near-clean band (tiny strengths) densely covers the identity regime,
    # so serving near-clean inputs satisfies the no-harm gate instead of being
    # pulled onto the restoration manifold
    near_clean = jax.random.bernoulli(jax.random.fold_in(key, 13), 0.15, (n, 1)).astype(
        jnp.float32
    )
    scale = 1.0 - near_clean * 0.94
    strength = jax.random.uniform(keys[1], (n, 7)) * active * (1.0 - keep_clean) * scale
    if cfg.deconv:
        # strong-tail resample for the inversion-learnable channels
        # (0=blur, 3=compression): 40% of ACTIVE draws move to [0.7, 1.0],
        # so full-strength deconvolution/deringing is a common training
        # task instead of a distribution tail (VERDICT r3 next #4)
        kd1, kd2 = jax.random.split(jax.random.fold_in(key, 31))
        hard = jax.random.bernoulli(kd1, 0.4, (n, 7)).astype(jnp.float32)
        tail = jax.random.uniform(kd2, (n, 7), minval=0.7, maxval=1.0)
        emph = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])[None, :]
        # exclude the near-clean band (scale 0.06): its dense identity-regime
        # coverage is what keeps the serving no-harm gate green — resampling
        # those rows to [0.7, 1.0] would destroy it
        take = hard * emph * (strength > 0.0) * (1.0 - near_clean)
        strength = strength * (1.0 - take) + tail * take
    if protect is not None:
        # 1 = well-posed on graded targets (blur/noise/compression/scratch),
        # 0 = ambiguous (lowLight/fade/colorShift), gated by protect
        wellposed = jnp.asarray([1.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0])[None, :]
        strength = strength * (wellposed + (1.0 - wellposed) * (1.0 - protect))

    x = clean

    # blur: per-image sigma via interpolation between blur levels
    blurred = jnp.stack(
        [x] + [jax.vmap(lambda im: gaussian_blur(im, s))(x) for s in (1.0, 2.0, 3.0)],
        axis=1,
    )  # [N, 4, H, W, C]
    sigma_frac = strength[:, 0]  # 0..1 -> level 0..3
    level = sigma_frac * 3.0
    low = jnp.floor(level).astype(jnp.int32)
    frac = level - low
    idx = jnp.arange(n)
    x_gauss = blurred[idx, low] * (1 - frac)[:, None, None, None] + blurred[
        idx, jnp.minimum(low + 1, 3)
    ] * frac[:, None, None, None]
    if cfg.photo:
        # photographic optics variant: disk-defocus / motion-line PSF bank
        kb1, kb2 = jax.random.split(jax.random.fold_in(key, 21))
        use_psf = jax.random.bernoulli(kb1, 0.5, (n, 1, 1, 1))
        bank = _PSF_BANK_RICH if cfg.deconv else _PSF_BANK
        psf_idx = jax.random.randint(kb2, (n,), 0, bank.shape[0])
        psf_s = strength[:, 0]
        if cfg.deconv:
            # reach FULL convolution at strength >= 0.6: the alpha-mix left
            # residual sharp content the model learned to copy instead of
            # inverting the PSF (round-3 OOD defocus/motion gain ~0 dB)
            psf_s = jnp.minimum(psf_s / 0.6, 1.0) * (psf_s > 0.0)
        x = jnp.where(use_psf, _psf_blur(x, psf_idx, psf_s, bank=bank), x_gauss)
    else:
        x = x_gauss

    # noise
    noise = jax.random.normal(keys[2], x.shape) * (strength[:, 1] * cfg.max_noise_std)[:, None, None, None]
    if cfg.photo:
        # sensor variant: signal-dependent Poisson-Gaussian
        kn1, kn2 = jax.random.split(jax.random.fold_in(key, 22))
        use_sig = jax.random.bernoulli(kn1, 0.5, (n, 1, 1, 1))
        x = jnp.where(use_sig, _signal_noise(kn2, x, strength[:, 1]), x + noise)
    else:
        x = x + noise

    # low light
    gain = 1.0 - strength[:, 2] * cfg.max_dark_gain
    x_gain = x * gain[:, None, None, None]
    if cfg.photo:
        use_vig = jax.random.bernoulli(jax.random.fold_in(key, 23), 0.5, (n, 1, 1, 1))
        x = jnp.where(use_vig, _vignette_dark(x, strength[:, 2]), x_gain)
        # physical coupling: underexposure DAMAGE always carries shot noise
        # (low signal -> low SNR on a real sensor), while a creatively dark
        # clean image is noiseless. This is the learnable cue separating
        # 'brighten + denoise' from 'leave the low-key grade alone'.
        x = _signal_noise(jax.random.fold_in(key, 25), x, 0.55 * strength[:, 2])
    else:
        x = x_gain

    # compression analog: 8x8 block-average mix (blocking artifacts)
    b = 8
    nh, nw = x.shape[1] // b, x.shape[2] // b
    blocks = x[:, : nh * b, : nw * b].reshape(n, nh, b, nw, b, -1).mean(axis=(2, 4))
    blocky = jnp.repeat(jnp.repeat(blocks, b, axis=1), b, axis=2)
    comp = strength[:, 3][:, None, None, None] * 0.7
    x_blocky = x.at[:, : nh * b, : nw * b].set(
        x[:, : nh * b, : nw * b] * (1 - comp) + blocky * comp
    )
    if cfg.photo and x.shape[1] % 16 == 0 and x.shape[2] % 16 == 0:
        # real-DCT variant: annex-K quantization in YCbCr with 4:2:0 chroma,
        # active only where the compression strength is non-zero
        x_dct = _jpeg_analog(jnp.clip(x, 0.0, 1.0), strength[:, 3])
        s_on = (strength[:, 3] > 0.01)[:, None, None, None]
        p_dct = 0.75 if cfg.deconv else 0.5
        use_dct = jax.random.bernoulli(jax.random.fold_in(key, 24), p_dct, (n, 1, 1, 1))
        # compression-solo rows model real JPEG uploads: always the DCT analog
        use_dct = use_dct | (solo[:, :, None, None] > 0.0)
        x = jnp.where(use_dct & s_on, x_dct, x_blocky)
    else:
        x = x_blocky

    # scratch: random thin bright line
    size = x.shape[1]
    pos = jax.random.uniform(keys[3], (n, 2))
    slope = jax.random.uniform(keys[4], (n,), minval=-0.3, maxval=0.3)
    cols = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    rows = jnp.arange(size, dtype=jnp.float32)[None, :, None]
    line_x = pos[:, 0][:, None, None] * size + slope[:, None, None] * rows
    dist = jnp.abs(cols - line_x)
    line = jnp.exp(-dist * 2.0)[..., None]
    x = x + line * strength[:, 4][:, None, None, None]

    # fade: pull towards mid-gray, reduce saturation
    fade = strength[:, 5][:, None, None, None] * cfg.max_fade
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = x * (1 - fade) + (0.5 * 0.6 + gray * 0.4) * fade

    # color shift: per-channel gain imbalance
    shift = jax.random.uniform(keys[5], (n, 3), minval=-1.0, maxval=1.0)
    shift = shift * (strength[:, 6] * cfg.max_shift)[:, None]
    x = x * (1.0 + shift[:, None, None, :])

    return jnp.clip(x, 0.0, 1.0), strength


@partial(jax.jit, static_argnames=("n", "cfg", "with_masks"))
def synthetic_batch(
    key: jax.Array, n: int, cfg: DataConfig = DataConfig(), with_masks: bool = False
):
    """(degraded [N,S,S,3], clean [N,S,S,3], cond [N,28]) — one device program.

    With ``with_masks=True`` a fourth output is appended: ``comp_only`` [N]
    in {0,1}, marking damage rows whose ONLY active degradation channel is
    compression (the compression_solo emphasis rows plus the natural
    jpeg-only tail). The trainer's identity-anchor term
    (trainer.py anchor_comp) keys on it.

    The conditioning vector is computed by running the SERVING classifier on
    the degraded image (classify/fused.py), not from the applied degradation
    strengths: at inference the model only ever sees classifier-estimated
    scores, so training must condition on the same distribution (an earlier
    true-strength variant trained to +11 dB in-distribution but transferred
    ~0 dB through the serving path). ``is_jpeg`` is randomised since serving
    traffic is mostly JPEG.
    """
    from ..classify.fused import batch_classify_and_condition

    k_clean, k_deg, k_jpeg = jax.random.split(key, 3)
    if cfg.photo:
        clean, aug = _clean_photo_mix(
            k_clean, n, cfg.size, cfg.channels, grain=cfg.grain, smooth=cfg.smooth,
            smooth_share=cfg.smooth_share,
        )
    else:
        gen = _random_clean_rich if cfg.rich else _random_clean
        clean = gen(k_clean, n, cfg.size, cfg.channels)
        aug = None
    degraded, _strength = _degrade(k_deg, clean, cfg, protect=aug)
    is_jpeg = jax.random.bernoulli(k_jpeg, 0.7, (n,)).astype(jnp.float32)
    valid = jnp.tile(jnp.asarray([[cfg.size, cfg.size]], jnp.int32), (n, 1))
    _scores, cond = batch_classify_and_condition(degraded * 255.0, valid, is_jpeg)
    if with_masks:
        # derived from the strengths _degrade actually applied (post-resample)
        others = jnp.sum(_strength, axis=1) - _strength[:, 3]
        comp_only = ((_strength[:, 3] > 0.0) & (others <= 0.0)).astype(jnp.float32)
        return degraded, clean, cond, comp_only
    return degraded, clean, cond
