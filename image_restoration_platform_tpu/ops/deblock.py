"""Gated JPEG deblocking stage: quant-step estimation + overcomplete
shifted-grid DCT soft-thresholding, fused into the serving program.

Why this exists: the learned backbone is net-NEGATIVE on compression-dominant
inputs (measured on the promoted round-4 flagship: OOD jpeg_q10_60 e2e
-1.04 dB, real-photo corpus -2.55 dB), and 40k steps of compression-emphasis
training moved it little — the reference's product premise is exactly these
uploads (reference `image-restoration-platform.md:1140`, the restoration
service contract in `server-node/src/services/restoratorService.js`). The
quantization grid, unlike the other degradations, is directly observable in
the decoded image, so a classical stage recovers what conditioning cannot:

1. **Quant-step estimation** (`estimate_qstep`): on the 8x8-aligned block DCT
   of the luma channel, a JPEG round-trip leaves every coefficient of
   frequency (u,v) clustered at multiples of the quant-table step q_uv. The
   mode of the rounded nonzero |c| histogram over all valid blocks recovers
   q_uv; the median over the three lowest AC frequencies is the image's
   q-hat. Clean/noisy/blurred content has no such cluster and yields q-hat
   ~0 — the estimator IS the gate (measured over 168 non-jpeg eval images:
   every false fire sat at lambda <= 1.3, below LAM_MIN_FIRE; jpeg images
   fire at lambda >= 2.2 with strictly positive per-image gains).

2. **Overcomplete DCT shrinkage** (`deblock_canvas_batch`): soft-threshold
   the AC coefficients (threshold lambda = 0.22 * q-hat, the plateau of a
   coefficient sweep; chroma 1.5x — JPEG chroma tables are coarser) on four
   half-block-shifted 8x8 grids in BT.601 YCbCr and average. The shifted
   grids convert blocking discontinuities into in-block energy the shrinkage
   removes; averaging restores translation invariance. Measured pre-backbone:
   +0.56 dB (procedural jpeg mix), +0.40 dB (real-photo corpus), min
   per-image gain >= +0.07; end-to-end through the flagship the jpeg axis
   moves -1.04 -> -0.62 (OOD) and -2.55 -> -1.38 (real) with zero change on
   every other degradation class and on clean inputs.

Everything is static-shaped reshapes + 8x8 matmuls (MXU-friendly, no FFTs);
the expensive four-grid pass runs under ``lax.cond`` on "did any image in
the batch fire", so the common no-fire batch pays only the aligned-grid
estimator. Non-firing images pass through BIT-IDENTICAL.

TPU-native counterpart of capability the reference delegated to the external
restore call (`server-node/src/clients/geminiClient.js:32-97`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 8
# lambda = LAM_COEF * q-hat. Swept 0.15..0.35 on the procedural + real jpeg
# eval batches: 0.20-0.30 is a plateau (+0.55/+0.40 dB), 0.22 the midpoint.
LAM_COEF = 0.22
LAM_CHROMA = 1.5
# fire threshold: the false-fire audit (clean / poisson / defocus / motion /
# vignette, procedural + real, 168 images) measured every non-jpeg lambda
# <= 1.3 while true jpeg fires sat >= 2.2.
LAM_MIN_FIRE = 1.5
LAM_CAP = 8.0
Q_MAX = 100  # histogram range of the step estimator (q10 luma low-AC ~ 50)
SHIFTS = ((0, 0), (4, 4), (0, 4), (4, 0))
# the three lowest AC frequencies (v,u) carry the most blocks with nonzero
# coefficients at any quality, so their histogram modes are the most stable
EST_FREQS = ((0, 1), (1, 0), (1, 1))


def _dct_mat() -> np.ndarray:
    k = np.arange(BLOCK)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * BLOCK))
    m *= np.sqrt(2.0 / BLOCK)
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


_DCT = _dct_mat()

# BT.601 full-range, matching the C++ codec's encode path (imageio.cpp)
_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
)
_YCC2RGB = np.array(
    [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]],
    dtype=np.float32,
)


def _block_dct(ch: jnp.ndarray) -> jnp.ndarray:
    """[H,W] -> [H/8, W/8, 8, 8] forward 8x8 DCT (two small matmuls)."""
    h, w = ch.shape
    b = ch.reshape(h // BLOCK, BLOCK, w // BLOCK, BLOCK).transpose(0, 2, 1, 3)
    d = jnp.asarray(_DCT)
    return jnp.einsum("ij,abjl,ml->abim", d, b, d)


def _block_idct(c: jnp.ndarray) -> jnp.ndarray:
    """[H/8, W/8, 8, 8] -> [H,W] inverse 8x8 DCT."""
    nb_y, nb_x = c.shape[:2]
    d = jnp.asarray(_DCT)
    b = jnp.einsum("ji,abjl,lm->abim", d, c, d)
    return b.transpose(0, 2, 1, 3).reshape(nb_y * BLOCK, nb_x * BLOCK)


def estimate_qstep(y: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """Luma quant-step estimate for ONE image: [H,W] (0..255) -> scalar q-hat.

    Mode-of-histogram of rounded nonzero |c| per low AC frequency over all
    blocks fully inside the valid region; a frequency contributes only when
    its mode is a real cluster (mass >= max(4, 8% of nonzero count) — flat
    histograms from natural content have no such mode). q-hat = median of
    the three per-frequency estimates (exact order statistic on 3 values).
    """
    c = _block_dct(y)  # [nbY, nbX, 8, 8]
    nb_y, nb_x = c.shape[:2]
    by = jnp.arange(nb_y)[:, None]
    bx = jnp.arange(nb_x)[None, :]
    inside = ((by + 1) * BLOCK <= valid_hw[0]) & ((bx + 1) * BLOCK <= valid_hw[1])

    def one_freq(u: int, v: int) -> jnp.ndarray:
        vals = jnp.rint(jnp.abs(c[:, :, u, v]))
        ok = inside & (vals >= 1) & (vals < Q_MAX)
        # [nbY,nbX,Q_MAX-1] one-hot histogram, summed over blocks
        ks = jnp.arange(1, Q_MAX, dtype=vals.dtype)
        hist = jnp.sum(
            ok[:, :, None] & (vals[:, :, None] == ks[None, None, :]), axis=(0, 1)
        )
        n = jnp.sum(ok)
        m = jnp.argmax(hist)
        q = (m + 1).astype(jnp.float32)
        mass_ok = hist[m] >= jnp.maximum(4, 0.08 * n)
        return jnp.where(mass_ok, q, 0.0)

    qs = jnp.stack([one_freq(u, v) for (u, v) in EST_FREQS])
    return jnp.sort(qs)[1]  # median of 3


def deblock_lambda(canvas_f32: jnp.ndarray, valid_hw: jnp.ndarray) -> jnp.ndarray:
    """Batched per-image luma threshold: [B,H,W,3] (0..255), [B,2] -> [B]."""
    y = canvas_f32 @ jnp.asarray(_RGB2YCC[0])
    q_hat = jax.vmap(estimate_qstep)(y, valid_hw)
    return jnp.minimum(LAM_COEF * q_hat, LAM_CAP)


def _soft_threshold_plane(ch: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """One channel plane [H,W] on one grid: shrink AC, keep DC exactly."""
    c = _block_dct(ch)
    dc = c[..., 0:1, 0:1]
    c = jnp.sign(c) * jnp.maximum(jnp.abs(c) - lam, 0.0)
    c = c.at[..., 0:1, 0:1].set(dc)
    return _block_idct(c)


def _deblock_one(img_f32: jnp.ndarray, lam_y: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] RGB (0..255) -> deblocked RGB, four shifted grids averaged."""
    ycc = img_f32 @ jnp.asarray(_RGB2YCC.T)
    h, w, _ = ycc.shape
    lam = jnp.stack([lam_y, lam_y * LAM_CHROMA, lam_y * LAM_CHROMA])
    acc = jnp.zeros_like(ycc)
    for sy, sx in SHIFTS:
        py, px = (BLOCK - sy) % BLOCK, (BLOCK - sx) % BLOCK
        p = jnp.pad(ycc, ((sy, py), (sx, px), (0, 0)), mode="edge")
        out = jnp.stack(
            [_soft_threshold_plane(p[..., ci], lam[ci]) for ci in range(3)], axis=-1
        )
        acc = acc + out[sy : sy + h, sx : sx + w]
    return (acc / len(SHIFTS)) @ jnp.asarray(_YCC2RGB.T)


def deblock_canvas_batch(
    canvas_u8: jnp.ndarray, valid_hw: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """u8 [B,H,W,3] -> (u8 deblocked-or-passthrough, fire [B] bool).

    Non-firing images are selected from the ORIGINAL u8 tensor, so the stage
    is bit-identical off-fire. H and W must be multiples of 8 (serving canvas
    buckets are powers of two); anything else passes through untouched.
    """
    b, h, w, _ = canvas_u8.shape
    if h % BLOCK or w % BLOCK or h < 64 or w < 64:
        return canvas_u8, jnp.zeros((b,), jnp.bool_)
    x = canvas_u8.astype(jnp.float32)
    lam = deblock_lambda(x, valid_hw)
    fire = lam > LAM_MIN_FIRE
    raw = jax.vmap(_deblock_one)(x, lam)
    out_u8 = jnp.clip(jnp.round(raw), 0, 255).astype(jnp.uint8)
    return jnp.where(fire[:, None, None, None], out_u8, canvas_u8), fire


def deblock_and_recondition(canvas_u8, valid_hw, is_jpeg_f, scores, cond):
    """The serving insertion, placed BEFORE the spectral deblur stage (the
    deblur estimator's motion evidence is suppressed by blocking artifacts;
    running on the deblocked canvas can only help its recall).

    The four-grid pass and the reclassification run under ``lax.cond`` on
    "did any image fire"; the no-fire batch pays only the aligned-grid
    estimator (one 8x8 block DCT of luma + three histograms). Structural
    scores are recomputed on the deblocked canvas — residual blocking no
    longer drives the noise/compression detectors, which the backbone would
    over-correct — while photometric scores (lowLight/fade/colorShift) keep
    the original classification, exactly the split the deblur stage uses
    (ops/deblur.py:deblur_and_recondition); DCT shrinkage preserves DC so
    photometry is untouched by construction.

    Returns (canvas_u8, scores, cond) — the returned scores feed the deblur
    stage's compression surcharge; callers report the ORIGINAL scores."""
    from ..classify.fused import batch_classify_and_condition, conditioning_from_scores

    b, h, w, _ = canvas_u8.shape
    if h % BLOCK or w % BLOCK or h < 64 or w < 64:
        return canvas_u8, scores, cond

    x = canvas_u8.astype(jnp.float32)
    lam = deblock_lambda(x, valid_hw)
    fire = lam > LAM_MIN_FIRE

    def fire_branch(canvas_u8):
        raw = jax.vmap(_deblock_one)(x, lam)
        out_u8 = jnp.clip(jnp.round(raw), 0, 255).astype(jnp.uint8)
        deblocked = jnp.where(fire[:, None, None, None], out_u8, canvas_u8)
        post_scores, _ = batch_classify_and_condition(
            deblocked.astype(jnp.float32), valid_hw, is_jpeg_f
        )
        photometric = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0])
        mixed = post_scores * (1.0 - photometric) + scores * photometric
        mixed = jnp.where(fire[:, None], mixed, scores)
        return deblocked, mixed, jax.vmap(conditioning_from_scores)(mixed)

    def skip_branch(canvas_u8):
        return canvas_u8, scores, cond

    return jax.lax.cond(jnp.any(fire), fire_branch, skip_branch, canvas_u8)


# ---------------------------------------------------------------------------
# Numpy reference (tests assert the jax path against this)
# ---------------------------------------------------------------------------


def deblock_reference(img_f32: np.ndarray) -> tuple[np.ndarray, float, bool]:
    """Single full-valid image numpy mirror: [H,W,3] in [0,1] ->
    (out [0,1], lambda, fired)."""
    x = img_f32.astype(np.float64) * 255.0
    h, w, _ = x.shape
    d = _DCT.astype(np.float64)

    def block_dct(ch):
        bl = ch.reshape(h // BLOCK, BLOCK, -1, BLOCK).transpose(0, 2, 1, 3)
        return np.einsum("ij,abjl,ml->abim", d, bl, d)

    y = x @ _RGB2YCC[0].astype(np.float64)
    c = block_dct(y)
    qs = []
    for u, v in EST_FREQS:
        vals = np.rint(np.abs(c[:, :, u, v])).astype(int).ravel()
        vals = vals[(vals >= 1) & (vals < Q_MAX)]
        q = 0.0
        if len(vals) >= 8:
            hist = np.bincount(vals, minlength=Q_MAX)
            m = int(np.argmax(hist[1:])) + 1
            if hist[m] >= max(4, 0.08 * len(vals)):
                q = float(m)
        qs.append(q)
    lam = min(LAM_COEF * float(np.median(qs)), LAM_CAP)
    if lam <= LAM_MIN_FIRE:
        return img_f32, lam, False

    ycc = x @ _RGB2YCC.T.astype(np.float64)
    acc = np.zeros_like(ycc)
    for sy, sx in SHIFTS:
        p = np.pad(
            ycc, ((sy, (BLOCK - sy) % BLOCK), (sx, (BLOCK - sx) % BLOCK), (0, 0)),
            mode="edge",
        )
        out = np.empty_like(p)
        for ci, l in enumerate((lam, lam * LAM_CHROMA, lam * LAM_CHROMA)):
            cc = np.einsum(
                "ij,abjl,ml->abim",
                d,
                p[..., ci].reshape(p.shape[0] // BLOCK, BLOCK, -1, BLOCK).transpose(0, 2, 1, 3),
                d,
            )
            dc = cc[..., 0:1, 0:1].copy()
            cc = np.sign(cc) * np.maximum(np.abs(cc) - l, 0.0)
            cc[..., 0:1, 0:1] = dc
            bl = np.einsum("ji,abjl,lm->abim", d, cc, d)
            out[..., ci] = bl.transpose(0, 2, 1, 3).reshape(p.shape[0], p.shape[1])
        acc += out[sy : sy + h, sx : sx + w]
    rgb = (acc / len(SHIFTS)) @ _YCC2RGB.T.astype(np.float64)
    return np.clip(rgb / 255.0, 0.0, 1.0).astype(np.float32), lam, True
