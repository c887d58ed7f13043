"""Training: sharded train step (pjit over the dp x tp x sp mesh) + orbax
checkpoints.

The reference has nothing to train (SURVEY.md section 5 "checkpoint/resume:
no model checkpoints"); this subsystem is what makes the on-TPU restoration
model real rather than random-init plumbing. Design:

  - loss: Charbonnier (robust L1) + gradient-difference for edge fidelity
  - optimizer: adamw with cosine decay + warmup (optax)
  - the train step is one jit-compiled program with explicit shardings:
    params column-parallel over ``tensor`` (parallel/sharding.py), batch over
    ``data``, optional row-sharding over ``spatial`` — gradients are averaged
    by GSPMD-inserted collectives, no manual psum
  - rematerialisation: res blocks run under jax.checkpoint when
    ``remat=True``, trading FLOPs for HBM at large batch/size
  - checkpoints: orbax StandardCheckpointer (save/restore params+opt_state+step)
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import get_family
from ..parallel.sharding import activation_sharding, batch_sharding, param_shardings
from ..utils.logging import get_logger
from .data import DataConfig, synthetic_batch


@dataclass(frozen=True)
class TrainConfig:
    family: str = "restore-unet"
    batch_size: int = 32
    image_size: int = 128
    learning_rate: float = 2e-4
    weight_decay: float = 1e-4
    warmup_steps: int = 200
    total_steps: int = 10_000
    charbonnier_eps: float = 1e-3
    grad_loss_weight: float = 0.1
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False
    seed: int = 0
    # weight multiplier for near-identity examples in the restoration loss
    identity_weight: float = 3.0
    # >0 (diffusion family only): train THROUGH the unrolled K-step DDIM
    # sampler against the clean target instead of the single-step denoising
    # loss — sampler-aware fine-tuning that makes very low step counts
    # (1-2) match the quality of the 8-step sampler at serving time
    diffusion_sampler_steps: int = 0
    # round-3 photographic-physics data distribution (DataConfig.photo)
    data_photo: bool = False
    # fraction of batches drawn from the rich photo=False distribution when
    # data_photo is on. The texture-heavy photo mix alone taught the SR
    # families to hallucinate texture into smooth gradients (-5 dB vs
    # nearest on the rich held-out); deterministic 50/50 interleaving keeps
    # both regimes represented (both DataConfigs hit their own cached jit)
    data_mix_rich: float = 0.0
    # round-4 deconvolution emphasis (DataConfig.deconv): strong-tail PSF
    # and DCT damage so the model learns real deblur/dejpeg inversion
    data_deconv: bool = False
    # fraction of batches drawn with deconv=False (the mild photo
    # distribution) when data_deconv is on. Deconv-only training regressed
    # the mild-photo held-out ~1.5 dB across every round-4 candidate (the
    # strong-tail strengths and full-convolution PSF thin out mild-damage
    # coverage for the same conditioning scores); interleaving keeps both
    # regimes represented, exactly like data_mix_rich does for the rich
    # distribution
    data_mix_mild: float = 0.0
    # round-4 aperiodic micro-texture cleans (DataConfig.grain): real-photo
    # clean-harm fix — stochastic texture the model must PRESERVE
    data_grain: bool = False
    # round-4 smooth-gradient cleans (DataConfig.smooth): SR anti-
    # hallucination fix — texture-FREE surfaces the model must keep smooth
    data_smooth: bool = False
    # share of the clean mix the smooth family takes (DataConfig.smooth_share)
    data_smooth_share: float = 0.10
    # fraction of examples kept fully clean (DataConfig.clean_fraction).
    # Raised for SR top-ups: sr-x2 loses to nearest-neighbor on CLEAN
    # downscales (round-4 open item #3) because only 15% of its training
    # inputs were identity-regime
    data_clean_fraction: float = 0.15
    # round-5 compression-solo emphasis (DataConfig.compression_solo): the
    # dejpeg residual — the backbone harms jpeg-ONLY inputs — is a
    # distribution gap, not a capacity one (jpeg-only was a 0.8% tail)
    data_compression_solo: float = 0.0
    # low-light-only counterweight share (DataConfig.lowlight_solo)
    data_lowlight_solo: float = 0.0
    # round-5 identity anchor on compression-only rows (lambda). The plain
    # compression-solo emphasis made the REAL-corpus jpeg axis WORSE
    # (-5.13 -> -7.08 dB, validator HOLD 2026-08-20): under an L2-ish loss
    # the optimum on irrecoverably-compressed texture is the posterior mean
    # — learned smoothing that generalizes terribly to real texture. The
    # anchor adds lambda * charbonnier(pred, INPUT) on comp-only rows.
    # Charbonnier is smooth-L1, so for lambda < 1 the anchor term loses
    # wherever the clean-target pull is coherent (recoverable content keeps
    # training toward clean, unchanged) and wins exactly where the clean
    # pull direction-cancels across the ensemble of plausible targets
    # (irrecoverable texture) — there the model learns to leave the input
    # alone instead of smoothing it.
    anchor_comp: float = 0.0


def charbonnier(pred, target, eps):
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def identity_weighted_charbonnier(pred, target, inputs, eps, identity_weight=3.0):
    """Charbonnier with per-example weights that emphasize the near-identity
    regime: examples whose input is already close to the target get ~4x
    weight, so the model learns 'do no harm' on clean inputs instead of
    pulling them onto the restoration manifold (the clean-input no-harm
    gate, VERDICT round-1 item 4)."""
    per_ex = jnp.mean(
        jnp.sqrt(jnp.square(pred - target) + eps * eps), axis=(1, 2, 3)
    )  # [N]
    input_mse = jnp.mean(jnp.square(inputs - target), axis=(1, 2, 3))  # [N]
    w = 1.0 + identity_weight * jnp.exp(-input_mse / 1e-3)
    return jnp.sum(per_ex * w) / jnp.sum(w)


def gradient_loss(pred, target):
    """L1 on spatial finite differences — keeps restored edges crisp."""
    dy_p, dy_t = pred[:, 1:] - pred[:, :-1], target[:, 1:] - target[:, :-1]
    dx_p, dx_t = pred[:, :, 1:] - pred[:, :, :-1], target[:, :, 1:] - target[:, :, :-1]
    return jnp.mean(jnp.abs(dy_p - dy_t)) + jnp.mean(jnp.abs(dx_p - dx_t))


def make_optimizer(cfg: TrainConfig):
    warmup = min(cfg.warmup_steps, max(1, cfg.total_steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=cfg.total_steps,
        end_value=cfg.learning_rate * 0.05,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def make_train_step(cfg: TrainConfig, mesh=None):
    """Returns (train_step, init_state). train_step is jit-compiled with mesh
    shardings when a mesh is given; state = (params, opt_state, step)."""
    family = get_family(cfg.family)
    model_cfg = family.config
    optimizer = make_optimizer(cfg)

    apply_fn = family.apply
    if cfg.remat:
        apply_fn = jax.checkpoint(
            lambda p, x, c: family.apply(p, x, c, config=model_cfg), static_argnums=()
        )

    is_sr = cfg.family.startswith("sr-")
    is_diffusion = hasattr(model_cfg, "unet")  # DiffusionConfig
    sr_scale = getattr(model_cfg, "scale", 1)

    def loss_fn(params, degraded, clean, cond, anchor, step=0):
        if is_diffusion and cfg.diffusion_sampler_steps > 0:
            # sampler-aware fine-tune: run the real K-step DDIM restore
            # (differentiable scan) and regress the final image on clean
            import dataclasses as _dc

            from ..models import diffusion as diff_mod

            scfg = _dc.replace(model_cfg, sample_steps=cfg.diffusion_sampler_steps)
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 177), step)
            pred = diff_mod.restore(
                params,
                degraded.astype(cfg.compute_dtype),
                cond.astype(cfg.compute_dtype),
                key,
                scfg,
            ).astype(jnp.float32)
            loss = charbonnier(pred, clean, cfg.charbonnier_eps)
            return loss + cfg.grad_loss_weight * gradient_loss(pred, clean)
        if is_diffusion:
            # epsilon-prediction: noise clean images, predict the noise,
            # conditioned on the degradation profile of the paired degraded
            # image (so serving-time SDEdit denoising is degradation-aware)
            from ..models import diffusion as diff_mod

            ucfg = model_cfg.unet
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 77), step)
            k_t, k_eps = jax.random.split(key)
            n = clean.shape[0]
            x0 = clean * 2.0 - 1.0
            x_cond = degraded * 2.0 - 1.0  # SR3-style conditioning channels
            t_frac = jax.random.uniform(k_t, (n,))
            eps = jax.random.normal(k_eps, x0.shape)
            xt = diff_mod.add_noise(x0, eps, t_frac)
            t_vec = t_frac * model_cfg.timesteps
            from ..models import unet as unet_mod

            model_in = jnp.concatenate([xt, x_cond], axis=-1)
            out = unet_mod.apply(
                params,
                model_in.astype(cfg.compute_dtype),
                cond.astype(cfg.compute_dtype),
                t=t_vec,
                config=ucfg,
            )
            if getattr(model_cfg, "parameterization", "eps") == "x0":
                return jnp.mean(jnp.square(out.astype(jnp.float32) - x0))
            eps_pred = out.astype(jnp.float32) - xt
            return jnp.mean(jnp.square(eps_pred - eps))
        if is_sr:
            # SR pairs: low-res = box-downsampled *degraded* image (so the SR
            # net learns restoration + upscaling jointly), target = clean.
            # The serving-time residual spectral limiter (srnet.residual_limit)
            # is DISABLED under training: its clamp zeroes gradients outside
            # the envelope and would silently change the optimization problem
            # mid-schedule (the round-5 chip queue resumes checkpoints trained
            # without it).
            import dataclasses as _dc

            train_model_cfg = (
                _dc.replace(model_cfg, limit_pool=0)
                if getattr(model_cfg, "limit_pool", 0)
                else model_cfg
            )
            n, h, w, c = degraded.shape
            lr = degraded.reshape(n, h // sr_scale, sr_scale, w // sr_scale, sr_scale, c).mean(
                axis=(2, 4)
            )
            pred = family.apply(params, lr.astype(cfg.compute_dtype), train_model_cfg)
        else:
            x = degraded.astype(cfg.compute_dtype)
            if cfg.remat:
                pred = apply_fn(params, x, cond.astype(cfg.compute_dtype))
            else:
                pred = apply_fn(params, x, cond.astype(cfg.compute_dtype), config=model_cfg)
            pred = pred.astype(jnp.float32)
            loss = identity_weighted_charbonnier(
                pred, clean, degraded, cfg.charbonnier_eps, cfg.identity_weight
            )
            if cfg.anchor_comp > 0.0:
                # identity anchor on compression-only rows (see TrainConfig
                # anchor_comp): smooth-L1 pull toward the INPUT that only
                # dominates where the clean-target pull direction-cancels
                per_ex = jnp.mean(
                    jnp.sqrt(
                        jnp.square(pred - degraded) + cfg.charbonnier_eps**2
                    ),
                    axis=(1, 2, 3),
                )  # [N]
                loss = loss + cfg.anchor_comp * jnp.sum(anchor * per_ex) / jnp.maximum(
                    jnp.sum(anchor), 1.0
                )
            return loss + cfg.grad_loss_weight * gradient_loss(pred, clean)
        pred = pred.astype(jnp.float32)
        loss = charbonnier(pred, clean, cfg.charbonnier_eps)
        loss = loss + cfg.grad_loss_weight * gradient_loss(pred, clean)
        return loss

    def train_step(state, degraded, clean, cond, anchor):
        params, opt_state, step = state
        loss, grads = jax.value_and_grad(loss_fn)(
            params, degraded, clean, cond, anchor, step
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, step + 1), loss

    def init_state():
        key = jax.random.PRNGKey(cfg.seed)
        params = family.init(key, model_cfg)
        opt_state = optimizer.init(params)
        return (params, opt_state, jnp.zeros((), jnp.int32))

    if mesh is None:
        return jax.jit(train_step), init_state

    def sharded_init():
        params, opt_state, step = init_state()
        # TP layout on params; optimizer moments inherit it through GSPMD
        # (jit propagates shardings from operands)
        p_shard = param_shardings(params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        opt_state = jax.tree_util.tree_map(jax.device_put, opt_state)
        return (params, opt_state, step)

    return jax.jit(train_step), sharded_init


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig = TrainConfig(),
        mesh=None,
        checkpoint_dir: str | None = None,
        warm_start: bool = False,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.logger = get_logger("trainer")
        self.step_fn, self._init = make_train_step(cfg, mesh)
        self.state = self._init()
        if warm_start:
            # resume from the family's exported serving weights (fine-tuning
            # at a different resolution or continuing a previous run)
            import os

            from ..models import weights as weights_mod

            path = weights_mod.weights_path(cfg.family)
            if os.path.exists(path):
                params, opt_state, step = self.state
                params = weights_mod.load_params(params, path)
                self.state = (params, opt_state, step)
                self.logger.info("warm-started from weights", {"path": path})
        self.checkpoint_dir = checkpoint_dir
        self._data_cfg = DataConfig(
            size=cfg.image_size,
            photo=cfg.data_photo,
            deconv=cfg.data_deconv,
            grain=cfg.data_grain,
            smooth=cfg.data_smooth,
            smooth_share=cfg.data_smooth_share,
            clean_fraction=cfg.data_clean_fraction,
            compression_solo=cfg.data_compression_solo,
            lowlight_solo=cfg.data_lowlight_solo,
        )
        self._data_cfg_rich = DataConfig(
            size=cfg.image_size, photo=False, clean_fraction=cfg.data_clean_fraction
        )
        self._data_cfg_mild = DataConfig(
            size=cfg.image_size,
            photo=cfg.data_photo,
            deconv=False,
            grain=cfg.data_grain,
            smooth=cfg.data_smooth,
            smooth_share=cfg.data_smooth_share,
            clean_fraction=cfg.data_clean_fraction,
            compression_solo=cfg.data_compression_solo,
            lowlight_solo=cfg.data_lowlight_solo,
        )
        self._mix_acc = 0.0
        self._mix_acc_mild = 0.0

    def place_batch(self, batch):
        if self.mesh is None:
            return batch
        degraded, clean, cond = batch[:3]
        act = activation_sharding(self.mesh, spatial=False)
        vec = batch_sharding(self.mesh)
        placed = (
            jax.device_put(degraded, act),
            jax.device_put(clean, act),
            jax.device_put(cond, vec),
        )
        if len(batch) > 3:  # comp-only anchor mask [N]
            placed = placed + (jax.device_put(batch[3], vec),)
        return placed

    def run(self, steps: int, log_every: int = 50) -> list[float]:
        # the data key persists across run() calls so callers can chunk a
        # long schedule (periodic weight export) without repeating batches
        if getattr(self, "_run_key", None) is None:
            self._run_key = jax.random.PRNGKey(self.cfg.seed + 1)
        losses = []
        t0 = time.time()
        for i in range(steps):
            self._run_key, bk = jax.random.split(self._run_key)
            cfg_step = self._data_cfg
            if self.cfg.data_photo and self.cfg.data_mix_rich > 0.0:
                # deterministic fraction-exact interleave of the two
                # distributions (error-diffusion accumulator, no RNG sync)
                self._mix_acc += self.cfg.data_mix_rich
                if self._mix_acc >= 1.0:
                    self._mix_acc -= 1.0
                    cfg_step = self._data_cfg_rich
            if (
                self.cfg.data_photo
                and self.cfg.data_deconv
                and self.cfg.data_mix_mild > 0.0
            ):
                # same error-diffusion interleave for the mild (deconv=False)
                # photo distribution, as a fraction of ALL batches: the
                # accumulator advances every step; on a collision rich wins
                # and the mild credit carries to the next step
                self._mix_acc_mild += self.cfg.data_mix_mild
                if self._mix_acc_mild >= 1.0 and cfg_step is self._data_cfg:
                    self._mix_acc_mild -= 1.0
                    cfg_step = self._data_cfg_mild
            batch = synthetic_batch(bk, self.cfg.batch_size, cfg_step, with_masks=True)
            batch = self.place_batch(batch)
            self.state, loss = self.step_fn(self.state, *batch)
            if i % log_every == 0 or i == steps - 1:
                loss_val = float(loss)
                losses.append(loss_val)
                self.logger.info(
                    "train step",
                    {
                        "step": int(self.state[2]),
                        "loss": round(loss_val, 5),
                        "imgs_per_sec": round(self.cfg.batch_size * (i + 1) / (time.time() - t0), 1),
                    },
                )
        return losses

    # ------------------------------------------------------- checkpointing

    def save_checkpoint(self, path: str | None = None) -> str:
        import orbax.checkpoint as ocp

        path = path or self.checkpoint_dir
        if path is None:
            raise ValueError("no checkpoint directory configured")
        params, opt_state, step = self.state
        with ocp.StandardCheckpointer() as ckpt:
            ckpt.save(
                f"{path}/step_{int(step)}",
                {"params": params, "opt_state": opt_state, "step": np.asarray(step)},
                force=True,
            )
        return f"{path}/step_{int(step)}"

    def load_params(self, path: str) -> dict:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckpt:
            restored = ckpt.restore(path)
        return restored["params"]

    def resume_checkpoint(self, path: str) -> None:
        """Restore params + optimizer moments + step so continued training
        keeps its Adam state and schedule position."""
        import orbax.checkpoint as ocp

        params, opt_state, _step = self.state
        template = {"params": params, "opt_state": opt_state, "step": np.asarray(0)}
        with ocp.StandardCheckpointer() as ckpt:
            restored = ckpt.restore(path, template)
        self.state = (restored["params"], restored["opt_state"], int(restored["step"]))
