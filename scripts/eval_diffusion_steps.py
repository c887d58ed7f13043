"""Held-out +dB sweep over diffusion sample step counts (VERDICT item 8:
serving at <=2 steps must match the 8-step sampler's quality)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_platform_tpu.models import diffusion, get_family
from image_restoration_platform_tpu.train.data import DataConfig, synthetic_batch


def psnr(a, b):
    mse = float(jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))))
    return 10.0 * np.log10(1.0 / max(mse, 1e-10))


def main():
    from image_restoration_platform_tpu.models import weights as W

    family = get_family("diffusion-restore")
    template = family.init(jax.random.PRNGKey(0), family.config)
    params = jax.device_put(W.load_params(template, W.weights_path("diffusion-restore")))
    key = jax.random.PRNGKey(4242)
    degraded, clean, cond = synthetic_batch(key, 16, DataConfig(size=128))
    print(f"degraded PSNR: {psnr(degraded, clean):.2f} dB")

    for steps in (1, 2, 4, 8):
        cfg = dataclasses.replace(family.config, sample_steps=steps)
        t0 = time.time()
        out = diffusion.restore(params, degraded, cond, jax.random.PRNGKey(7), cfg)
        out = jax.block_until_ready(out)
        dt = time.time() - t0
        # second call: steady-state timing
        t0 = time.time()
        out = jax.block_until_ready(
            diffusion.restore(params, degraded, cond, jax.random.PRNGKey(8), cfg)
        )
        warm = time.time() - t0
        print(f"steps={steps}: {psnr(out, clean):.2f} dB  (warm {warm*1000:.0f} ms/b16)")


if __name__ == "__main__":
    main()
