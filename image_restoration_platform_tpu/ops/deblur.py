"""Spectral blind deblur: PSF estimation + gated Wiener deconvolution.

The reference platform externalizes all actual restoration to a remote
model call (reference: server-node/src/clients/geminiClient.js:32-97); its
own classifier detects blur (classifierService.js:104-127) but nothing in
the stack can *invert* it. This module gives the TPU-native serving path a
real deconvolution capability: defocus (disk PSF) and linear motion blur
are detected from the image's power spectrum, the kernel is identified
against a parametric hypothesis bank, and a Wiener inverse filter is
applied — batched, jittable, one extra XLA fusion group in front of the
restore backbone.

Why not leave deblur to the learned model: blind deconvolution needs the
*kernel*, and the UNet's 28-dim global conditioning cannot carry it — after
40k steps of PSF-diverse training the flagship still measured ~0 dB on
out-of-distribution defocus/motion (round-4 ranker, .staging_deconv), while
a Wiener filter with the true kernel gains +17 dB on the same inputs. The
kernel, however, is *identifiable from the spectrum*: blur multiplies the
image spectrum by the PSF's OTF, imprinting its null pattern (rings for
disks, parallel lines for motion) — so estimate-then-invert beats
learn-to-invert here.

Detection pipeline (per image, all batched):
  1. median log power spectrum over four corner crops of the valid region
     (median suppresses crop-local texture peaks; blur structure is global),
  2. radial-residual normalization: subtract the per-ring mean so the
     natural ~1/f^2 falloff cancels and only angular/ring structure remains,
  3. normalized correlation against the hypothesis bank's residual log-OTFs
     selects the kernel; a prefer-disk margin rule breaks near-ties toward
     the benign disk inversions,
  4. acceptance requires *absolute* null-contrast evidence (mean residual
     at the template's null cells vs its high cells, in nats) — correlation
     rank alone false-fires on periodic textures. Axis-aligned motion
     hypotheses (0/90 deg) need much deeper nulls (2.6 vs 0.9 nats): JPEG
     blocking and demosaic artifacts imprint axis-aligned line patterns
     that mimic them (measured: every real-photo false fire was axis-
     aligned), while true motion blur lands at a random angle,
  5. the classifier's compression score raises the threshold and the Wiener
     noise floor (deconvolving quantization noise is a loss), a high
     noise-band ratio vetoes (deep nulls can't survive noise anyway), and a
     total-variation backstop rejects inversions that exploded into ringing.

Measured on the round-4 corpora (16/class, fresh seeds, u8 canvases — the
real serving condition): OOD motion +4.0 dB / real-photo motion +4.4 dB,
zero false fires over 128 clean/JPEG/noisy images, worst single fired image
-0.03 dB. Target was >= +1.0 dB (VERDICT r3 next-round item 4). The disk
(defocus) channel is implemented but disabled: at 8-bit depth a disk's ring
nulls are below the quantization/sensor noise floor (see
DISK_CHANNEL_ENABLED below) — defocus recovery stays with the learned
model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Hypothesis bank (host-side, tiny, built once)
# ---------------------------------------------------------------------------

KSIZE = 17  # common PSF canvas: supports disk r<=4.0 and motion length<=15
DISK_RADII = tuple(float(r) for r in np.arange(1.25, 4.01, 0.125))
MOTION_LENGTHS = (4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0, 13.0, 14.0, 15.0)
N_ANGLES = 16

ANALYSIS_SIZE = 128  # spectra are estimated on crops of this size
_N_BINS = 24  # radial bins for the residual normalization

# acceptance thresholds (calibrated on the round-4 OOD + real corpora; see
# module docstring for the measured operating point). Selection runs per
# KIND: the best disk and the best motion hypothesis gate independently on
# correlation AND null-contrast, because their evidence scales differ — a
# disk's ring nulls are shallower per cell (nc ~1.2 when true) while true
# motion's line nulls run deeper but vary widely (1.2-5.2 measured); the
# joint corr+nc gate is what separates — clean texture that reaches one
# statistic never reached both in any calibration corpus (0 false fires in
# 128 clean/JPEG images across procedural and real-photo sets)
# The disk (defocus) channel is DISABLED for 8-bit serving inputs: a disk's
# ring nulls sit in the mid band where the blurred signal power is
# comparable to the quantization/sensor noise floor (~1 LSB), so the null
# contrast that identifies the radius is simply not present in a u8 canvas
# — measured nc collapses from 0.6-2.2 (float) to 0.1-0.3 (u8, with or
# without dither/floor-subtraction), indistinguishable from clean content.
# Motion nulls survive quantization because their line nulls cross the
# high-SNR low-frequency band.
#
# The >=10-bit ingest path landed in round 5: 16-bit PNG uploads decode to
# raw u16 (imageio.decode_image_u16) and run deblur_canvas_f32 with
# enable_disk=True BEFORE 8-bit quantization (serve/restorator.py HDR
# pre-pass) — there the ring nulls are real signal and the channel fires.
DISK_CHANNEL_ENABLED = False
CORR_DISK_MIN = 0.15
# the motion channel's protection is nc + the directional-gradient veto +
# the axis/short-kernel surcharges; corr is only a weak sanity floor (true
# motion on busy textures measures corr 0.16-0.20 with unambiguous nc/ratio)
CORR_MOTION_MIN = 0.12
NC_DISK = 0.75
NC_MOTION = 0.9
NC_AXIS_MOTION = 2.6  # JPEG blocking mimics axis-aligned motion nulls
NC_SHORT_MOTION_SLOPE = 0.25  # short kernels have few nulls in band => the
NC_SHORT_MOTION_REF = 6.0  # contrast statistic is noisier; demand more
NC_COMPRESSION_SLOPE = 0.6
NOISE_RATIO_MAX = 0.25
# spatial-domain veto for the motion channel: blur at angle a removes sharp
# gradients ALONG a (P99 |grad_along| / P99 |grad_perp| <= ~0.7 measured on
# true motion) while the confusable clean periodic textures keep sharp edges
# in every direction (ratio 0.76-1.01 on every calibration false-positive)
DIR_RATIO_MAX = 0.75
K_DISK = 1e-3  # Wiener noise floor for disk inversions
K_MOTION = 3e-3  # motion inversions are directional => more ringing risk
K_COMPRESSION_SLOPE = 12.0
TV_RATIO_MAX = 3.0


def disk_psf(radius: float, ksize: int = KSIZE) -> np.ndarray:
    """Soft-edged disk (half-pixel anti-aliasing): ideal defocus bokeh."""
    r0 = ksize // 2
    yy, xx = np.mgrid[-r0 : r0 + 1, -r0 : r0 + 1].astype(np.float32)
    psf = np.clip(radius + 0.5 - np.sqrt(yy**2 + xx**2), 0.0, 1.0)
    return psf / psf.sum()


def motion_psf(length: float, angle: float, ksize: int = KSIZE) -> np.ndarray:
    """Anti-aliased line segment: linear camera-shake motion blur."""
    r0 = ksize // 2
    yy, xx = np.mgrid[-r0 : r0 + 1, -r0 : r0 + 1].astype(np.float32)
    t = xx * np.cos(angle) + yy * np.sin(angle)
    dperp = -xx * np.sin(angle) + yy * np.cos(angle)
    psf = np.clip(1.0 - np.abs(dperp), 0.0, 1.0) * (np.abs(t) <= length / 2)
    s = psf.sum()
    return (psf / s if s > 0 else disk_psf(1.0, ksize)).astype(np.float32)


@functools.lru_cache(maxsize=1)
def psf_bank():
    """(psfs [NH,K,K] f32, is_disk [NH] bool, is_axis [NH] bool, names).

    Use psf_bank_meta() for the per-hypothesis angle/length arrays."""
    psfs, is_disk, is_axis, names = [], [], [], []
    for r in DISK_RADII:
        psfs.append(disk_psf(r))
        is_disk.append(True)
        is_axis.append(False)
        names.append(f"disk{r:.3f}")
    for length in MOTION_LENGTHS:
        for ia in range(N_ANGLES):
            ang = np.pi * ia / N_ANGLES
            psfs.append(motion_psf(length, ang))
            is_disk.append(False)
            # within one angle step of 0/90 degrees: the JPEG-blocking
            # confusable set (blocking harmonics leak into +-11 deg — a
            # measured q<=60 false fire selected mot6@169)
            near = {0, 1, N_ANGLES - 1, N_ANGLES // 2 - 1, N_ANGLES // 2, N_ANGLES // 2 + 1}
            is_axis.append(ia in near)
            names.append(f"mot{length:.0f}@{np.degrees(ang):.0f}")
    return (
        np.stack(psfs).astype(np.float32),
        np.asarray(is_disk),
        np.asarray(is_axis),
        tuple(names),
    )


@functools.lru_cache(maxsize=1)
def psf_bank_meta():
    """(angle [NH] f32 radians, nc_extra [NH] f32): per-hypothesis blur
    direction (0 for disks, unused) and the short-motion null-contrast
    surcharge."""
    angles, nc_extra = [], []
    for _r in DISK_RADII:
        angles.append(0.0)
        nc_extra.append(0.0)
    for length in MOTION_LENGTHS:
        for ia in range(N_ANGLES):
            angles.append(np.pi * ia / N_ANGLES)
            nc_extra.append(NC_SHORT_MOTION_SLOPE * max(0.0, NC_SHORT_MOTION_REF - length))
    return np.asarray(angles, np.float32), np.asarray(nc_extra, np.float32)


def _otf(psf: np.ndarray, size_hw) -> np.ndarray:
    """Complex OTF of a centered PSF on an arbitrary grid (numpy, host)."""
    h, w = size_hw
    pad = np.zeros((h, w), np.float32)
    ph, pw = psf.shape
    pad[:ph, :pw] = psf
    pad = np.roll(pad, (-(ph // 2), -(pw // 2)), axis=(0, 1))
    return np.fft.rfft2(pad)


@functools.lru_cache(maxsize=4)
def analysis_constants(size: int = ANALYSIS_SIZE):
    """Precomputed spectra-domain constants for the estimator at `size`.

    All are plain numpy; the jitted batch functions close over them as XLA
    constants. ~20 MB at size=128 — amortized across every serving program.
    """
    psfs, is_disk, is_axis, _names = psf_bank()
    nh = psfs.shape[0]
    rw = size // 2 + 1

    log_t = np.empty((nh, size, rw), np.float32)
    for i in range(nh):
        log_t[i] = np.log(np.abs(_otf(psfs[i], (size, size))) ** 2 + 1e-8)

    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    fr = np.sqrt(fy**2 + fx**2)
    wmask = ((fr > 0.06) & (fr < 0.46)).astype(np.float32)
    noiseband = (fr >= 0.47).astype(np.float32)

    bins = np.minimum((fr / 0.5 * _N_BINS).astype(np.int32), _N_BINS - 1)
    binmat = np.zeros((_N_BINS, size * rw), np.float32)
    flat_b, flat_m = bins.ravel(), wmask.ravel()
    for k in range(_N_BINS):
        sel = (flat_b == k) * flat_m
        s = sel.sum()
        if s > 0:
            binmat[k] = sel / s

    def radial_residual(log_p: np.ndarray) -> np.ndarray:
        ring_means = binmat @ log_p.ravel()
        return (log_p - ring_means[bins]) * wmask

    t_res = np.stack([radial_residual(t) for t in log_t])
    t_norm = np.sqrt((t_res**2).sum(axis=(1, 2))) + 1e-8

    # normalized null / high-cell weight maps per hypothesis: nc becomes two
    # inner products instead of boolean gathers (MXU-friendly)
    null_w = np.zeros_like(t_res)
    rest_w = np.zeros_like(t_res)
    for i in range(nh):
        vals = log_t[i][wmask > 0]
        null = (log_t[i] <= np.quantile(vals, 0.08)) & (wmask > 0)
        rest = (log_t[i] >= np.quantile(vals, 0.5)) & (wmask > 0)
        null_w[i] = null / max(1, null.sum())
        rest_w[i] = rest / max(1, rest.sum())

    hann = (np.hanning(size)[:, None] * np.hanning(size)[None, :]).astype(np.float32)
    return dict(
        size=size,
        log_t_res=t_res.astype(np.float32),
        t_norm=t_norm.astype(np.float32),
        null_w=null_w.astype(np.float32),
        rest_w=rest_w.astype(np.float32),
        wmask=wmask,
        noiseband=noiseband,
        bins=bins,
        binmat=binmat,
        hann=hann,
        is_disk=is_disk,
        is_axis=is_axis,
        psfs=psfs,
    )


# ---------------------------------------------------------------------------
# Batched estimator + Wiener (jax, jit-safe, static shapes)
# ---------------------------------------------------------------------------


def _crop_starts(valid_hw: jnp.ndarray, canvas_hw, size: int):
    """Corner-crop starts inside the valid region, clamped to the canvas."""
    vh = jnp.minimum(valid_hw[:, 0], canvas_hw[0])
    vw = jnp.minimum(valid_hw[:, 1], canvas_hw[1])
    y1 = jnp.clip(vh - size, 0, canvas_hw[0] - size)
    x1 = jnp.clip(vw - size, 0, canvas_hw[1] - size)
    z = jnp.zeros_like(y1)
    return jnp.stack(
        [
            jnp.stack([z, z], -1),
            jnp.stack([z, x1], -1),
            jnp.stack([y1, z], -1),
            jnp.stack([y1, x1], -1),
        ],
        axis=1,
    )  # [B, 4, 2]


def _corner_crops(gray: jnp.ndarray, valid_hw: jnp.ndarray, size: int):
    """[B,H,W] -> [B,4,size,size] corner crops of the valid region."""
    b, h, w = gray.shape
    if h < size or w < size:
        raise ValueError(f"canvas {h}x{w} below analysis size {size}")
    starts = _crop_starts(valid_hw, (h, w), size)

    def one_crop(img, yx):
        return jax.lax.dynamic_slice(img, (yx[0], yx[1]), (size, size))

    return jax.vmap(lambda img, s4: jax.vmap(lambda yx: one_crop(img, yx))(s4))(
        gray, starts
    )


def _spectral_evidence(crops: jnp.ndarray, size: int):
    """Per-hypothesis correlation and null-contrast from the median
    corner-crop spectrum. crops [B,4,size,size] float32 (any photometric
    scale — the statistics are log-ratios). Returns (corr [B,NH],
    nc [B,NH], noise_ratio [B])."""
    c = analysis_constants(size)
    b = crops.shape[0]

    hann = jnp.asarray(c["hann"])
    crops = (crops - crops.mean(axis=(-2, -1), keepdims=True)) * hann
    power = jnp.abs(jnp.fft.rfft2(crops)) ** 2  # [B,4,size,rw]
    log_p = jnp.median(jnp.log(power + 1e-8), axis=1)  # [B,size,rw]

    binmat = jnp.asarray(c["binmat"])  # [NB, size*rw]
    bins = jnp.asarray(c["bins"])  # [size,rw]
    wmask = jnp.asarray(c["wmask"])
    ring_means = log_p.reshape(b, -1) @ binmat.T  # [B,NB]
    y_res = (log_p - ring_means[:, bins]) * wmask  # [B,size,rw]

    t_res = jnp.asarray(c["log_t_res"])  # [NH,size,rw]
    t_norm = jnp.asarray(c["t_norm"])
    y_norm = jnp.sqrt(jnp.sum(y_res**2, axis=(1, 2))) + 1e-8
    corr = jnp.einsum("bsr,nsr->bn", y_res, t_res) / (t_norm[None, :] * y_norm[:, None])

    null_w = jnp.asarray(c["null_w"])  # [NH,size,rw], rows sum to 1
    rest_w = jnp.asarray(c["rest_w"])
    nc = jnp.einsum("bsr,nsr->bn", y_res, rest_w) - jnp.einsum(
        "bsr,nsr->bn", y_res, null_w
    )

    noiseband = jnp.asarray(c["noiseband"])
    power_med = jnp.exp(log_p)
    noise_p = jnp.sum(power_med * noiseband, axis=(1, 2)) / noiseband.sum()
    sig_p = jnp.sum(power_med * wmask, axis=(1, 2)) / wmask.sum()
    return corr, nc, noise_p / (sig_p + 1e-8)


def select_hypothesis(
    gray: jnp.ndarray,
    valid_hw: jnp.ndarray,
    compression: jnp.ndarray,
    size: int = ANALYSIS_SIZE,
    enable_disk: bool = DISK_CHANNEL_ENABLED,
):
    """Per-kind gated selection. Returns (best [B] int32, fire [B] bool).

    The best disk and best motion hypothesis gate independently (their
    evidence scales differ — see the threshold block above); if both pass,
    the deeper null-contrast wins. The motion channel additionally requires
    the spatial directional-gradient veto: gradients along the hypothesized
    blur direction must actually be suppressed.
    """
    c = analysis_constants(size)
    crops = _corner_crops(gray, valid_hw, size)
    corr, nc, noise_ratio = _spectral_evidence(crops, size)

    is_disk = jnp.asarray(c["is_disk"])
    is_axis = jnp.asarray(c["is_axis"])
    comp_pen = NC_COMPRESSION_SLOPE * compression  # [B]

    disk_corr = jnp.where(is_disk[None, :], corr, -jnp.inf)
    # among disks, null-contrast ranks the radius more reliably than
    # correlation (measured: corr sometimes prefers far radii, nc never did)
    disk_rank = jnp.where(is_disk[None, :], nc, -jnp.inf)
    best_disk = jnp.argmax(disk_rank, axis=1)
    d_corr = jnp.take_along_axis(disk_corr, best_disk[:, None], 1)[:, 0]
    d_nc = jnp.take_along_axis(nc, best_disk[:, None], 1)[:, 0]
    disk_ok = (
        (d_corr >= CORR_DISK_MIN) & (d_nc >= NC_DISK + comp_pen) & enable_disk
    )

    mot_corr = jnp.where(is_disk[None, :], -jnp.inf, corr)
    best_mot = jnp.argmax(mot_corr, axis=1)
    m_corr = jnp.take_along_axis(mot_corr, best_mot[:, None], 1)[:, 0]
    m_nc = jnp.take_along_axis(nc, best_mot[:, None], 1)[:, 0]
    angles, nc_extra = psf_bank_meta()
    m_req = (
        jnp.where(is_axis[best_mot], NC_AXIS_MOTION, NC_MOTION)
        + jnp.asarray(nc_extra)[best_mot]
        + comp_pen
    )
    mot_ok = (m_corr >= CORR_MOTION_MIN) & (m_nc >= m_req)

    # directional-gradient veto (crops reused; percentile over all 4 crops).
    # Gated under lax.cond on the spectral pre-pass: the ratio only matters
    # for rows where mot_ok is already true, and on clean traffic no row
    # passes the spectral gates — so the common path skips the veto's two
    # q=99 order statistics entirely (lax.top_k still lowers to a ~full
    # per-row sort on v5e: 0.95 ms/step for f32[8,65536]x2 measured via
    # parse_xplane 2026-08-19 even after the top_k rewrite). When any row
    # fires, the taken branch computes the identical exact veto.
    ang = jnp.asarray(angles)[best_mot]  # [B]

    def _dir_ratio(operands):
        crops_, ang_ = operands
        gy, gx = jnp.gradient(crops_, axis=(2, 3))
        cos_a = jnp.cos(ang_)[:, None, None, None]
        sin_a = jnp.sin(ang_)[:, None, None, None]
        g_along = jnp.abs(gx * cos_a + gy * sin_a).reshape(crops_.shape[0], -1)
        g_perp = jnp.abs(-gx * sin_a + gy * cos_a).reshape(crops_.shape[0], -1)
        return _percentile_high(g_along, 99.0) / (_percentile_high(g_perp, 99.0) + 1e-8)

    ratio = jax.lax.cond(
        jnp.any(mot_ok),
        _dir_ratio,
        lambda operands: jnp.zeros((crops.shape[0],), crops.dtype),
        (crops, ang),
    )
    mot_ok = mot_ok & (ratio <= DIR_RATIO_MAX)

    pick_mot = mot_ok & (~disk_ok | (m_nc > d_nc))
    best = jnp.where(pick_mot, best_mot, best_disk).astype(jnp.int32)
    fire = (disk_ok | mot_ok) & (noise_ratio <= NOISE_RATIO_MAX)
    return best, fire


def _percentile_high(x: jnp.ndarray, q: float) -> jnp.ndarray:
    """Exact ``jnp.percentile(x, q, axis=1)`` for high q via ``lax.top_k``.

    ``jnp.percentile`` lowers to a full per-row sort — measured 0.50 ms per
    f32[8,65536] row-sort on v5e (parse_xplane, 2026-08-19), ~1.0 ms/step
    (~4%) for the two q=99 calls in the directional veto. The linear
    interpolation between the two order statistics around rank
    ``q/100*(n-1)`` needs only the top ``n - floor(rank)`` values, which
    top_k produces in a fraction of a full sort. The selected order
    statistics are identical to jnp.percentile's; the interpolation weight
    is computed in f64 here (jnp quantizes the rank to f32, ~6e-6 absolute
    difference at n=65536 — immaterial for the 0.75-threshold veto).
    """
    n = x.shape[1]
    rank = q / 100.0 * (n - 1)
    lo = int(np.floor(rank))
    frac = jnp.asarray(rank - lo, x.dtype)
    k = n - lo  # top_k[k-1] = asc[lo], top_k[k-2] = asc[lo+1]
    top = jax.lax.top_k(x, k)[0]
    v_lo = top[:, k - 1]
    v_hi = top[:, k - 2] if k >= 2 else top[:, k - 1]
    # same interpolation expression as jax's _quantile (linear method)
    return v_lo * (1 - frac) + v_hi * frac


def _batched_otf(psf_b: jnp.ndarray, size_hw) -> jnp.ndarray:
    """[B,K,K] PSFs -> [B,H,W/2+1] complex OTFs at the canvas size."""
    h, w = size_hw
    k = psf_b.shape[-1]
    pad = jnp.zeros((psf_b.shape[0], h, w), psf_b.dtype)
    pad = jax.lax.dynamic_update_slice(pad, psf_b, (0, 0, 0))
    pad = jnp.roll(pad, (-(k // 2), -(k // 2)), axis=(1, 2))
    return jnp.fft.rfft2(pad)


def _tv(x: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """Mean total variation per image over the VALID region of [B,H,W,C].

    The letterbox pad (edge-replicated, near-zero TV) must not dilute the
    input TV, or the ringing backstop trips on every letterboxed canvas."""
    b, h, w, _ = x.shape
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    mask = (rows < valid_hw[:, 0][:, None, None, None]) & (
        cols < valid_hw[:, 1][:, None, None, None]
    )
    dy = jnp.abs(jnp.diff(x, axis=1)) * mask[:, 1:, :, :]
    dx = jnp.abs(jnp.diff(x, axis=2)) * mask[:, :, 1:, :]
    n = jnp.maximum(jnp.sum(mask[:, 1:, :, :], axis=(1, 2, 3)), 1)
    m = jnp.maximum(jnp.sum(mask[:, :, 1:, :], axis=(1, 2, 3)), 1)
    return jnp.sum(dy, axis=(1, 2, 3)) / n + jnp.sum(dx, axis=(1, 2, 3)) / m


def deblur_canvas_batch(
    canvas_u8: jnp.ndarray,
    valid_hw: jnp.ndarray,
    compression: jnp.ndarray,
    size: int = ANALYSIS_SIZE,
) -> jnp.ndarray:
    """Gated Wiener deblur over letterboxed byte canvases (u8 -> u8).

    Images whose spectral evidence fails the acceptance gate pass through
    BIT-IDENTICAL (the select happens on the original u8 tensor), so the
    stage is a no-op on everything but confidently-identified blur.
    canvas_u8 [B,H,W,3] (edge-padded letterbox, serve/restorator.py:107),
    valid_hw [B,2], compression [B] = classifier compression score.
    """
    b, h, w, _ = canvas_u8.shape
    if h < size or w < size:
        # canvas below the analysis resolution (tiny test buckets): the
        # estimator's thresholds are calibrated at ANALYSIS_SIZE, so skip
        return canvas_u8
    c = analysis_constants(size)
    x = canvas_u8.astype(jnp.float32) / 255.0
    gray = x.mean(axis=-1)

    best, fire = select_hypothesis(gray, valid_hw, compression, size)
    is_disk = jnp.asarray(c["is_disk"])[best]

    psf_b = jnp.asarray(c["psfs"])[best]  # [B,K,K]
    otf = _batched_otf(psf_b, (h, w))  # [B,H,rw]
    k_wiener = (
        jnp.where(is_disk, K_DISK, K_MOTION) * (1.0 + K_COMPRESSION_SLOPE * compression)
    )[:, None, None]
    gain = jnp.conj(otf) / (jnp.abs(otf) ** 2 + k_wiener)  # [B,H,rw]

    spec = jnp.fft.rfft2(jnp.transpose(x, (0, 3, 1, 2)))  # [B,C,H,rw]
    raw = jnp.fft.irfft2(spec * gain[:, None, :, :], s=(h, w))
    raw = jnp.transpose(raw, (0, 2, 3, 1))  # [B,H,W,C]

    fire = fire & (_tv(raw, valid_hw) <= TV_RATIO_MAX * _tv(x, valid_hw) + 1e-6)

    out_u8 = jnp.clip(jnp.round(jnp.clip(raw, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
    return jnp.where(fire[:, None, None, None], out_u8, canvas_u8)


def deblur_canvas_f32(
    x: jnp.ndarray,
    valid_hw: jnp.ndarray,
    compression: jnp.ndarray,
    size: int = ANALYSIS_SIZE,
    enable_disk: bool = True,
) -> jnp.ndarray:
    """Gated Wiener deblur on FLOAT canvases ([B,H,W,3] in [0,1] -> same).

    The high-bit-depth entry (VERDICT r4 item 8): 16-bit PNG ingest decodes
    to u16, normalizes to f32, and runs this BEFORE any 8-bit quantization —
    which is what unlocks the disk (defocus) channel: at float/16-bit
    precision a defocus disk's spectral ring nulls carry real contrast
    (nc 0.6-2.2 measured) instead of drowning in the u8 quantization floor.
    Same estimator, gates, and TV backstop as deblur_canvas_batch; non-fired
    images pass through untouched.
    """
    b, h, w, _ = x.shape
    if h < size or w < size:
        return x
    c = analysis_constants(size)
    gray = x.mean(axis=-1)
    best, fire = select_hypothesis(gray, valid_hw, compression, size, enable_disk=enable_disk)
    is_disk = jnp.asarray(c["is_disk"])[best]

    psf_b = jnp.asarray(c["psfs"])[best]
    otf = _batched_otf(psf_b, (h, w))
    k_wiener = (
        jnp.where(is_disk, K_DISK, K_MOTION) * (1.0 + K_COMPRESSION_SLOPE * compression)
    )[:, None, None]
    gain = jnp.conj(otf) / (jnp.abs(otf) ** 2 + k_wiener)

    spec = jnp.fft.rfft2(jnp.transpose(x, (0, 3, 1, 2)))
    raw = jnp.fft.irfft2(spec * gain[:, None, :, :], s=(h, w))
    raw = jnp.transpose(raw, (0, 2, 3, 1))

    fire = fire & (_tv(raw, valid_hw) <= TV_RATIO_MAX * _tv(x, valid_hw) + 1e-6)
    return jnp.where(fire[:, None, None, None], jnp.clip(raw, 0.0, 1.0), x)


def deblur_and_recondition(canvas_u8, valid_hw, is_jpeg_f, scores, cond):
    """The serving insertion: deblur the canvas, then rebuild conditioning
    for what the backbone will actually see.

    The expensive work — the full-canvas FFT Wiener inversion and the
    post-deblur reclassification — runs under ``lax.cond`` on "did any image
    in the batch pass the spectral gate": the common no-fire batch pays only
    the estimator (corner-crop spectra + template einsums), which keeps the
    stage off the serving hot path (the unconditional form measured
    +1.0 ms/img on chip at 512px b8, +43% of the fused step).

    Structural scores (blur/noise/compression/scratch) are recomputed on the
    deconvolved canvas — that is the damage the backbone must now fix — while
    the photometric scores (lowLight/fade/colorShift) are kept from the
    ORIGINAL classification: Wiener filtering is per-channel identical and
    photometry-preserving, but its clipped ringing perturbs channel
    statistics enough to flip the colorShift detector, which then drove the
    backbone to "color-correct" an already-good image (-9 dB on a gate
    fixture). On FIRED images fade/colorShift are additionally zeroed (a
    Wiener-repaired image gets conservative photometric treatment; color
    work remains available on resubmission).

    Returns (canvas_u8, cond); the caller keeps reporting the original
    scores for the submitted image."""
    # lazy import: ops/__init__ -> deblur -> classify.fused -> ops would cycle
    from ..classify.fused import batch_classify_and_condition, conditioning_from_scores

    c = analysis_constants(ANALYSIS_SIZE)
    b, h, w, _ = canvas_u8.shape
    if h < ANALYSIS_SIZE or w < ANALYSIS_SIZE:
        return canvas_u8, cond

    x = canvas_u8.astype(jnp.float32) / 255.0
    best, fire_pre = select_hypothesis(x.mean(axis=-1), valid_hw, scores[:, 3])

    def fire_branch(canvas_u8):
        is_disk = jnp.asarray(c["is_disk"])[best]
        psf_b = jnp.asarray(c["psfs"])[best]
        otf = _batched_otf(psf_b, (h, w))
        k_wiener = (
            jnp.where(is_disk, K_DISK, K_MOTION)
            * (1.0 + K_COMPRESSION_SLOPE * scores[:, 3])
        )[:, None, None]
        gain = jnp.conj(otf) / (jnp.abs(otf) ** 2 + k_wiener)
        spec = jnp.fft.rfft2(jnp.transpose(x, (0, 3, 1, 2)))
        raw = jnp.transpose(jnp.fft.irfft2(spec * gain[:, None, :, :], s=(h, w)), (0, 2, 3, 1))
        fire = fire_pre & (_tv(raw, valid_hw) <= TV_RATIO_MAX * _tv(x, valid_hw) + 1e-6)
        out_u8 = jnp.clip(jnp.round(jnp.clip(raw, 0.0, 1.0) * 255.0), 0, 255).astype(jnp.uint8)
        deblurred = jnp.where(fire[:, None, None, None], out_u8, canvas_u8)

        post_scores, _ = batch_classify_and_condition(
            deblurred.astype(jnp.float32), valid_hw, is_jpeg_f
        )
        photometric = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0])
        mixed = post_scores * (1.0 - photometric) + scores * photometric
        conservative = mixed * jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
        mixed = jnp.where(fire[:, None], conservative, mixed)
        return deblurred, jax.vmap(conditioning_from_scores)(mixed)

    def skip_branch(canvas_u8):
        return canvas_u8, cond

    return jax.lax.cond(jnp.any(fire_pre), fire_branch, skip_branch, canvas_u8)


# ---------------------------------------------------------------------------
# Numpy reference (tests assert the jax path against this)
# ---------------------------------------------------------------------------


def deblur_reference(img_f32: np.ndarray, compression: float):
    """Single-image numpy mirror of deblur_canvas_batch on a full-valid
    canvas. Returns (out_f32, fired, hypothesis_name)."""
    c = analysis_constants(ANALYSIS_SIZE)
    _psfs, _is_disk, _is_axis, names = psf_bank()
    size = ANALYSIS_SIZE
    h, w = img_f32.shape[:2]
    gray = img_f32.mean(axis=2)
    crops = [
        gray[oy : oy + size, ox : ox + size]
        for oy in (0, max(0, h - size))
        for ox in (0, max(0, w - size))
    ]
    hann = c["hann"]
    specs = []
    for cr in crops:
        g = (cr - cr.mean()) * hann
        specs.append(np.log(np.abs(np.fft.rfft2(g)) ** 2 + 1e-8))
    log_p = np.median(np.stack(specs), axis=0)
    ring = c["binmat"] @ log_p.ravel()
    y_res = (log_p - ring[c["bins"]]) * c["wmask"]
    y_norm = np.sqrt((y_res**2).sum()) + 1e-8
    corr = (c["log_t_res"] * y_res).sum(axis=(1, 2)) / (c["t_norm"] * y_norm)
    nc_all = (y_res[None] * c["rest_w"]).sum(axis=(1, 2)) - (
        y_res[None] * c["null_w"]
    ).sum(axis=(1, 2))
    comp_pen = NC_COMPRESSION_SLOPE * compression

    best_disk = int(np.argmax(np.where(c["is_disk"], nc_all, -np.inf)))
    d_ok = (
        DISK_CHANNEL_ENABLED
        and corr[best_disk] >= CORR_DISK_MIN
        and nc_all[best_disk] >= NC_DISK + comp_pen
    )
    best_mot = int(np.argmax(np.where(c["is_disk"], -np.inf, corr)))
    angles, nc_extra = psf_bank_meta()
    m_req = (
        (NC_AXIS_MOTION if c["is_axis"][best_mot] else NC_MOTION)
        + nc_extra[best_mot]
        + comp_pen
    )
    m_ok = corr[best_mot] >= CORR_MOTION_MIN and nc_all[best_mot] >= m_req
    if m_ok:
        ang = angles[best_mot]
        g_stack = np.stack(crops)
        gy, gx = np.gradient(g_stack, axis=(1, 2))
        g_along = np.abs(gx * np.cos(ang) + gy * np.sin(ang)).ravel()
        g_perp = np.abs(-gx * np.sin(ang) + gy * np.cos(ang)).ravel()
        ratio = np.percentile(g_along, 99.0) / (np.percentile(g_perp, 99.0) + 1e-8)
        m_ok = ratio <= DIR_RATIO_MAX

    pick_mot = m_ok and (not d_ok or nc_all[best_mot] > nc_all[best_disk])
    best = best_mot if pick_mot else best_disk
    power = np.exp(log_p)
    noise_ratio = float(
        (power * c["noiseband"]).sum()
        / c["noiseband"].sum()
        / ((power * c["wmask"]).sum() / c["wmask"].sum() + 1e-8)
    )
    if not (d_ok or m_ok) or noise_ratio > NOISE_RATIO_MAX:
        return img_f32, False, names[best]
    k_wiener = (K_DISK if c["is_disk"][best] else K_MOTION) * (
        1.0 + K_COMPRESSION_SLOPE * compression
    )
    otf = _otf(c["psfs"][best], (h, w))
    gain = np.conj(otf) / (np.abs(otf) ** 2 + k_wiener)
    raw = np.empty_like(img_f32)
    for ch in range(3):
        raw[:, :, ch] = np.fft.irfft2(np.fft.rfft2(img_f32[:, :, ch]) * gain, s=(h, w))

    def tv(a):
        return float(
            np.mean(np.abs(np.diff(a, axis=0))) + np.mean(np.abs(np.diff(a, axis=1)))
        )

    if tv(raw) > TV_RATIO_MAX * tv(img_f32) + 1e-6:
        return img_f32, False, names[best]
    return np.clip(raw, 0.0, 1.0), True, names[best]
