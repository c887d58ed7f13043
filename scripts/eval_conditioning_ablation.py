"""Measure the quality gain from classify-before-restore (conditioning ablation).

The reference cites "15-20% quality improvement" for its classify-then-restore
workflow from arXiv 2506.05450 (image-restoration-platform.md:1140,1772) but
never measures it. This measures it on THIS framework: the same flagship
restore applied to the same degraded batches with

  (a) the serving conditioning — classifier scores -> 28-dim vector
      (classify/fused.py, exactly what the fused serving program feeds), vs
  (b) a neutral all-zero conditioning vector (no degradation information).

Reported per distribution (rich procedural / photographic):
  - gain_db_conditioned / gain_db_neutral: PSNR gain over the degraded input
  - delta_db: conditioned - neutral
  - pct: percentage improvement of the restored-PSNR *gain* (the most natural
    reading of the reference's "15-20% quality improvement" claim)

Runs on CPU (JAX_PLATFORMS=cpu) — safe to run while the TPU trains.

Usage: python scripts/eval_conditioning_ablation.py [--n 16] [--size 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=777_001)
    args = ap.parse_args()

    import jax

    if os.environ.get("IRP_EVAL_ON_TPU") != "1":
        # env JAX_PLATFORMS=cpu is pinned away by the sandbox site config;
        # only the config update forces CPU (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        assert jax.devices()[0].platform == "cpu", jax.devices()
    import jax.numpy as jnp
    import numpy as np

    from image_restoration_platform_tpu.models import get_family
    from image_restoration_platform_tpu.models import weights as W
    from image_restoration_platform_tpu.train.data import DataConfig, synthetic_batch

    def psnr(a, b):
        mse = float(jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))))
        return 10.0 * np.log10(1.0 / max(mse, 1e-10))

    family = get_family("restore-unet")
    params = W.load_params(
        family.init(jax.random.PRNGKey(0), family.config), W.weights_path("restore-unet")
    )

    def restore(degraded, cond):
        pred = family.apply(
            params, degraded.astype(jnp.bfloat16), cond.astype(jnp.bfloat16),
            config=family.config,
        )
        return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)

    out = {}
    for name, cfg in (
        ("rich", DataConfig(size=args.size)),
        ("photo", DataConfig(size=args.size, photo=True)),
    ):
        degraded, clean, cond = synthetic_batch(jax.random.PRNGKey(args.seed), args.n, cfg)
        base = psnr(degraded, clean)
        conditioned = psnr(restore(degraded, cond), clean) - base
        neutral = psnr(restore(degraded, jnp.zeros_like(cond)), clean) - base
        out[name] = {
            "gain_db_conditioned": round(conditioned, 3),
            "gain_db_neutral": round(neutral, 3),
            "delta_db": round(conditioned - neutral, 3),
            "pct": round(100.0 * (conditioned - neutral) / max(neutral, 1e-6), 1)
            if neutral > 0
            else None,
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
