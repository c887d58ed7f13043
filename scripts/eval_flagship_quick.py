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
    for name, cfg in (
        ("rich", DataConfig(size=args.size)),
        ("photo", DataConfig(size=args.size, photo=True)),
    ):
        degraded, clean, cond = synthetic_batch(jax.random.PRNGKey(args.seed), args.n, cfg)
        pred = family.apply(
            params, degraded.astype(jnp.bfloat16), cond.astype(jnp.bfloat16),
            config=family.config,
        )
        pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
        out[name] = round(psnr(pred, clean) - psnr(degraded, clean), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
