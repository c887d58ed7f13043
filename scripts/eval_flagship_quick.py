"""Quick flagship-only in-distribution eval: rich + photo held-out gains.

eval_quality.py sweeps every family (minutes on the 1-core box); candidate
ranking only needs the flagship's two in-distribution numbers — the axis the
promotion validator holds candidates on (the probe candidate improved every
OOD/real metric while regressing photo 5.9 -> 3.2 dB). One JSON line on
stdout: {"rich": gain_db, "photo": gain_db}.

Usage: IRP_WEIGHTS_DIR=<dir> python scripts/eval_flagship_quick.py [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=999_001)
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
    out = {}
    # metric matches scripts/eval_quality.py (upgraded 2026-08-19): mean
    # per-image gain over the damage rows of several independent batches —
    # the single-batch aggregate let one hard image flip promotion verdicts
    # and counted identity rows as "gain"
    seeds = int(os.environ.get("IRP_EVAL_SEEDS", "4"))
    for name, cfg in (
        ("rich", DataConfig(size=args.size)),
        ("photo", DataConfig(size=args.size, photo=True)),
    ):
        gains = []
        for k in range(seeds):
            degraded, clean, cond = synthetic_batch(
                jax.random.PRNGKey(args.seed + k), args.n, cfg
            )
            pred = family.apply(
                params, degraded.astype(jnp.bfloat16), cond.astype(jnp.bfloat16),
                config=family.config,
            )
            pred = np.asarray(jnp.clip(pred.astype(jnp.float32), 0.0, 1.0))
            deg = np.asarray(degraded, np.float32)
            cl = np.asarray(clean, np.float32)
            mse_in = np.maximum(np.mean(np.square(deg - cl), axis=(1, 2, 3)), 1e-10)
            mse_out = np.maximum(np.mean(np.square(pred - cl), axis=(1, 2, 3)), 1e-10)
            pin = 10.0 * np.log10(1.0 / mse_in)
            pout = 10.0 * np.log10(1.0 / mse_out)
            sel = pin < 48.0
            gains += list((pout - pin)[sel])
        out[name] = round(float(np.mean(gains)) if gains else 0.0, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
