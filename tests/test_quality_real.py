"""Real-photograph quality gates (round 4): the serving path over REAL photos
bundled in the sandbox (train/realphoto.py) under the OOD degradation physics.

These are the first non-procedural quality numbers in this repo (the
reference's product premise, image-restoration-platform.md:1140).

Gates are re-pinned (round 5) on the WIDENED corpus — train/realphoto.py
gained the adroit marble / crumpled-foil / brushed-metal material photos
(VERDICT r4 item 7), which are genuinely harder: dense high-frequency
texture the deconvolution and dejpeg paths tend to smooth. Round-4 shipped
weights measure on this corpus (seed 424242, n=8): poisson +3.10,
vignette +13.19, chained +2.05, defocus -3.99, motion -2.35, jpeg -5.13 dB;
clean mad 7.52/255 (p95 15.3, worst 15.4). On the narrower round-4 corpus
the same weights measured defocus -0.0 / motion -0.3 / jpeg -2.9 — the
deltas are the corpus, not a weight regression. The negative floors on
defocus/motion/jpeg remain retrain targets; tighten when new weights ship.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from image_restoration_platform_tpu.classify.fused import batch_classify_and_condition
from image_restoration_platform_tpu.models import get_family
from image_restoration_platform_tpu.models import weights as W
from image_restoration_platform_tpu.train.realphoto import (
    available_sources,
    real_clean_patches,
    real_eval_batch,
)

N, SIZE, SEED = 8, 128, 424_242

# (degradation, min mean gain dB) — keep in sync with the header note
GAIN_GATES = (
    # re-pinned 2026-08-20 after the identity-anchor promotion; measured
    # (this fixture, promoted weights): poisson +4.74, vignette +13.21,
    # chained +2.51, defocus -0.56, motion -0.07, jpeg -0.44 — the jpeg
    # axis moved -5.13 -> -0.44 (anchored rows stop the learned smoothing
    # of irrecoverable texture), defocus/motion are near-neutral instead
    # of harmful, clean mad halved (validator log
    # docs/measurements/r5/verdict_anchor_promote.log)
    ("poisson_gaussian", 3.0),
    ("vignette_low_light", 12.0),
    ("chained", 1.8),
    ("defocus", -1.5),
    ("motion", -1.0),
    ("jpeg_q10_60", -1.2),
)


def _psnr(a, b):
    mse = float(np.mean(np.square(np.asarray(a, np.float32) - np.asarray(b, np.float32))))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


@pytest.fixture(scope="module")
def serve():
    if not available_sources():
        pytest.skip("no real-photo sources on this machine")
    family = get_family("restore-unet")
    path = W.weights_path("restore-unet")
    if not os.path.exists(path):
        pytest.skip("no shipped flagship weights")
    params = W.load_params(family.init(jax.random.PRNGKey(0), family.config), path)

    @jax.jit
    def _serve(x):
        valid = jnp.tile(jnp.asarray([[SIZE, SIZE]], jnp.int32), (x.shape[0], 1))
        _s, cond = batch_classify_and_condition(
            x * 255.0, valid, jnp.ones((x.shape[0],), jnp.float32)
        )
        pred = family.apply(
            params, x.astype(jnp.bfloat16), cond.astype(jnp.bfloat16), config=family.config
        )
        return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

    return _serve


@pytest.mark.parametrize("degradation,min_gain", GAIN_GATES)
def test_real_photo_gain(serve, degradation, min_gain):
    degraded, clean = real_eval_batch(SEED, N, SIZE, degradation)
    pred = np.asarray(serve(jnp.asarray(degraded)))
    gain = _psnr(pred, clean) - _psnr(degraded, clean)
    assert gain >= min_gain, f"{degradation}: gain {gain:+.2f} dB < {min_gain:+.2f}"


def test_real_photo_clean_harm_bounded(serve):
    """Mean and worst-case deviation on clean real photos. Note the JPEG
    sources carry their own compression artifacts, so 'harm' here includes
    the model legitimately editing real artifacts — the bound is therefore
    looser than the procedural clean gate (mad <= 1/255)."""
    rng = np.random.default_rng(SEED + 1)
    clean = real_clean_patches(rng, N, SIZE)
    pred = np.asarray(serve(jnp.asarray(clean)))
    per_mad = np.mean(np.abs(pred - clean), axis=(1, 2, 3)) * 255.0
    # round-3 shipped weights measure mean 6.6 / worst ~21 at this seed; the
    # round-4 TRAIN_DATA_GRAIN retrain targets mean <= 3 / worst <= 10
    assert per_mad.mean() <= 8.0, f"mean clean mad {per_mad.mean():.2f}/255"
    assert per_mad.max() <= 28.0, f"worst clean mad {per_mad.max():.2f}/255"
