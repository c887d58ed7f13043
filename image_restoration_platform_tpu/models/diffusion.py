"""Image-conditioned diffusion restoration (SR3-style) with DDIM sampling.

The "diffusion U-Net" model family from the north star (BASELINE.json). Reuses
models/unet.py with ``time_conditioned=True`` as the epsilon-predictor; the
degraded image rides along as 3 extra input channels every denoising step
(SR3-style image conditioning — markedly stronger than an unconditional
SDEdit prior), and the degradation score vector conditions via FiLM exactly
as in the single-step model. Sampling is a ``jax.lax.scan`` over a static
step count — one compiled program regardless of the number of steps, no
Python loop in the hot path (XLA control-flow rule).

The schedule is cosine alpha-bar (Nichol & Dhariwal). Restoration denoises
from pure noise at ``strength=1.0`` (full generation conditioned on the
degraded image) or from a noised copy of the degraded image for
smaller strengths (SDEdit-style partial edit).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import unet


@dataclass(frozen=True)
class DiffusionConfig:
    timesteps: int = 1000
    # 2-step serving default: after sampler-aware fine-tuning (training
    # through the unrolled 2-step DDIM, train/trainer.py
    # diffusion_sampler_steps) the 2-step sampler measures BETTER held-out
    # +dB than 8-step (+12.4 vs +11.8) at 2.5x less device cost
    sample_steps: int = 2
    strength: float = 1.0       # 1.0 = denoise from pure noise (SR3); <1 = SDEdit
    # x0-prediction: the model predicts the clean image directly and DDIM
    # derives eps from it — markedly more PSNR-faithful than eps-prediction
    # for restoration at low step counts
    parameterization: str = "x0"
    # in_channels = 3 (x_t) + 3 (degraded conditioning image)
    unet: unet.UNetConfig = unet.UNetConfig(in_channels=6, time_conditioned=True)


def alpha_bar(t_frac: jax.Array) -> jax.Array:
    """Cosine schedule cumulative alpha at t/T in [0,1]."""
    s = 0.008
    f = jnp.cos((t_frac + s) / (1 + s) * jnp.pi / 2) ** 2
    f0 = jnp.cos(jnp.asarray(s / (1 + s)) * jnp.pi / 2) ** 2
    return jnp.clip(f / f0, 1e-5, 1.0)


def init(key: jax.Array, config: DiffusionConfig = DiffusionConfig()) -> dict:
    return unet.init(key, config.unet)


def add_noise(x0: jax.Array, noise: jax.Array, t_frac: jax.Array) -> jax.Array:
    ab = alpha_bar(t_frac)
    while ab.ndim < x0.ndim:
        ab = ab[..., None]
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


@partial(jax.jit, static_argnames=("config", "apply_fn"))
def restore(
    params: dict,
    x: jax.Array,
    cond: jax.Array,
    key: jax.Array,
    config: DiffusionConfig = DiffusionConfig(),
    apply_fn=None,
) -> jax.Array:
    """SDEdit restoration: noise the input to ``strength`` and DDIM back to 0.

    x [N,H,W,3] in [0,1]; returns the restored image, same shape/range.
    ``apply_fn`` overrides the epsilon-model forward (serving passes the
    W-folded variant, models/folded.py, with correspondingly folded params).
    """
    if apply_fn is None:
        apply_fn = unet.apply
    c = config
    # work in [-1, 1]; the degraded image conditions every step
    x_cond = x * 2.0 - 1.0
    noise = jax.random.normal(key, x_cond.shape, dtype=x_cond.dtype)
    t_start = jnp.asarray(c.strength)
    xt = add_noise(x_cond, noise, t_start)

    # DDIM timestep ladder from strength -> 0 (static length => one executable)
    fracs = jnp.linspace(c.strength, 0.0, c.sample_steps + 1)

    def step(carry, idx):
        xt = carry
        t_now = fracs[idx]
        t_next = fracs[idx + 1]
        t_vec = jnp.full((x.shape[0],), t_now * c.timesteps, dtype=jnp.float32)
        model_in = jnp.concatenate([xt, x_cond.astype(xt.dtype)], axis=-1)
        out = apply_fn(params, model_in, cond, t=t_vec, config=c.unet)
        ab_now = alpha_bar(t_now)
        ab_next = alpha_bar(t_next)
        if c.parameterization == "x0":
            x0_pred = jnp.clip(out, -1.0, 1.0)
            eps = (xt - jnp.sqrt(ab_now) * x0_pred) * jax.lax.rsqrt(
                jnp.maximum(1.0 - ab_now, 1e-5)
            )
        else:  # eps-prediction: residual head output minus x_t
            eps = out - xt
            x0_pred = (xt - jnp.sqrt(1.0 - ab_now) * eps) / jnp.sqrt(ab_now)
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        xt_next = jnp.sqrt(ab_next) * x0_pred + jnp.sqrt(1.0 - ab_next) * eps
        return xt_next.astype(xt.dtype), None  # keep the scan carry dtype stable

    xt, _ = jax.lax.scan(step, xt, jnp.arange(c.sample_steps))
    return jnp.clip((xt + 1.0) * 0.5, 0.0, 1.0)
