"""Quality gates on the SHIPPED weights over the rich held-out distribution:
restoration +dB and the clean-input no-harm contract (VERDICT round-1 item 4;
reference contract: 'good condition -> subtle enhancements only').

Skipped when the checkout carries no trained weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_platform_tpu.models import get_family
from image_restoration_platform_tpu.models import weights as W
from image_restoration_platform_tpu.train.data import DataConfig, synthetic_batch, _random_clean_rich


def _psnr(a, b):
    mse = float(jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def _load(family_name):
    path = W.weights_path(family_name)
    if not os.path.exists(path):
        pytest.skip(f"no shipped weights for {family_name}")
    family = get_family(family_name)
    template = family.init(jax.random.PRNGKey(0), family.config)
    return family, W.load_params(template, path)


@pytest.fixture(scope="module")
def heldout():
    # held-out seed disjoint from training's PRNG stream
    return synthetic_batch(jax.random.PRNGKey(999_001), 8, DataConfig(size=128))


def test_flagship_restoration_gain(heldout):
    family, params = _load("restore-unet")
    degraded, clean, cond = heldout
    pred = family.apply(
        params, degraded.astype(jnp.bfloat16), cond.astype(jnp.bfloat16), config=family.config
    )
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    gain = _psnr(pred, clean) - _psnr(degraded, clean)
    assert gain > 5.0, f"flagship gain {gain:.2f} dB below gate"


@pytest.mark.parametrize("seed", [999_002, 555])
def test_flagship_bounded_harm_on_near_clean(seed):
    """Bounded-harm contract on near-clean inputs through the serving
    classifier conditioning: output stays imperceptibly close to the clean
    reference (>= 42 dB; mean abs error under ~1.5/255).

    Strict PSNR(out) >= PSNR(in) is not enforceable for a blind restorer
    under the reference's heuristic classifier: low-detail images score
    blur~1 and high-detail images score noise~1, so every clean image reads
    as degraded on some axis (the reference's tests never assert low scores
    on clean images either). Identity-weighted training + the residual
    soft-shrinkage deadband bound the harm instead."""
    from image_restoration_platform_tpu.classify.fused import batch_classify_and_condition

    family, params = _load("restore-unet")
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    clean = _random_clean_rich(k1, 8, 128, 3)
    near = jnp.clip(clean + jax.random.normal(k2, clean.shape) * 0.004, 0.0, 1.0)
    valid = jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (8, 1))
    _s, cond = batch_classify_and_condition(near * 255.0, valid, jnp.ones((8,), jnp.float32))
    pred = family.apply(
        params, near.astype(jnp.bfloat16), cond.astype(jnp.bfloat16), config=family.config
    )
    pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    out_psnr = _psnr(pred, clean)
    mad = float(jnp.mean(jnp.abs(pred - clean))) * 255.0
    assert out_psnr >= 42.0, f"bounded-harm violated: out {out_psnr:.2f} dB"
    assert mad <= 1.5, f"mean abs error {mad:.2f}/255 exceeds imperceptibility bound"


def test_sr_x2_beats_nearest_baseline(heldout):
    family, params = _load("sr-x2")
    degraded, clean, _ = heldout
    scale = family.config.scale
    n, h, w, c = degraded.shape
    lr = degraded.reshape(n, h // scale, scale, w // scale, scale, c).mean(axis=(2, 4))
    pred = jnp.clip(
        family.apply(params, lr.astype(jnp.bfloat16), family.config).astype(jnp.float32), 0, 1
    )
    baseline = jnp.repeat(jnp.repeat(lr, scale, axis=1), scale, axis=2)
    gain = _psnr(pred, clean) - _psnr(baseline, clean)
    assert gain > 4.0, f"sr-x2 gain over nearest {gain:.2f} dB below gate"
