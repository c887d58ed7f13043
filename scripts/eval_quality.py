"""Full quality table over the shipped weights: every family on both held-out
distributions, plus the OOD summary. One JSON on stdout; human table on
stderr. This is the reproducible source for BASELINE.md's quality numbers.

Usage:
    python scripts/eval_quality.py [--n 8] [--size 128] [--seed 999001]

Runs on CPU by design (evaluation must not contend with a serving/training
TPU); the serving dtype (bf16) is used for every forward.

Distributions:
  rich   — DataConfig(photo=False): the round-2 held-out generator
  photo  — DataConfig(photo=True): the round-3 training distribution
           (photographic physics + creative grades + periodic texture)

SR families report gain over nearest-neighbor upsampling of the
2x2-box-downscaled clean (pure SR) AND of the degraded input (joint
restoration+SR, the tests/test_quality.py gate semantics).
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

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    dists = {
        "rich": DataConfig(size=args.size),
        "photo": DataConfig(size=args.size, photo=True),
    }
    report: dict = {}

    for fam_name in ("restore-unet", "restore-unet-small", "diffusion-restore"):
        family = get_family(fam_name)
        path = W.weights_path(fam_name)
        if not os.path.exists(path):
            continue
        template = family.init(jax.random.PRNGKey(0), family.config)
        params = W.load_params(template, path)
        entry = {}
        for dname, dcfg in dists.items():
            deg, clean, cond = synthetic_batch(jax.random.PRNGKey(args.seed), args.n, dcfg)
            if fam_name == "diffusion-restore":
                pred = family.apply(
                    params, deg.astype(jnp.bfloat16), cond.astype(jnp.bfloat16),
                    jax.random.PRNGKey(0), config=family.config,
                )
            else:
                pred = family.apply(
                    params, deg.astype(jnp.bfloat16), cond.astype(jnp.bfloat16),
                    config=family.config,
                )
            pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
            entry[dname] = {
                "psnr_in": round(psnr(deg, clean), 2),
                "psnr_out": round(psnr(pred, clean), 2),
                "gain_db": round(psnr(pred, clean) - psnr(deg, clean), 2),
            }
            log(
                f"{fam_name:22s} {dname:6s}: {entry[dname]['psnr_in']:6.2f} -> "
                f"{entry[dname]['psnr_out']:6.2f}  ({entry[dname]['gain_db']:+.2f} dB)"
            )
        report[fam_name] = entry

    def smooth_batch(seed, n, size):
        """Low-frequency-only eval surfaces (cosine gratings + ramp; no
        legitimate texture). Same evaluation family as
        tests/test_quality.py::_smooth_batch but a different seed/mix, and
        construction-disjoint from TRAIN_DATA_SMOOTH's bilinear control
        grids — this is the numeric anti-hallucination axis the promotion
        validator tracks (regression tolerance), complementing the hard gate."""
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        out = np.zeros((n, size, size, 3), np.float32)
        for i in range(n):
            img = np.zeros((size, size, 3), np.float32)
            for _ in range(4):
                fx, fy = rng.uniform(-2.5, 2.5, 2)
                ph = rng.uniform(0, 2 * np.pi)
                amp = rng.uniform(0.04, 0.18)
                g = amp * np.cos(2 * np.pi * (fx * xx + fy * yy) + ph)
                img += g[..., None] * rng.uniform(0.3, 1.0, 3)
            a, b = rng.uniform(-0.3, 0.3, 2)
            img += (a * xx + b * yy)[..., None] * rng.uniform(0.5, 1.0, 3)
            out[i] = np.clip(img + 0.35, 0.0, 1.0)
        return jnp.asarray(out)

    for fam_name in ("sr-x2", "sr-x4"):
        family = get_family(fam_name)
        path = W.weights_path(fam_name)
        if not os.path.exists(path):
            continue
        cfgm = family.config
        s = cfgm.scale
        template = family.init(jax.random.PRNGKey(0), cfgm)
        params = W.load_params(template, path)
        entry = {}
        smooth_hr = smooth_batch(args.seed + 9000, args.n, args.size)
        lo = smooth_hr.reshape(
            args.n, args.size // s, s, args.size // s, s, 3
        ).mean(axis=(2, 4))
        base = jnp.repeat(jnp.repeat(lo, s, axis=1), s, axis=2)
        pred = jnp.clip(
            family.apply(params, lo.astype(jnp.bfloat16), cfgm).astype(jnp.float32),
            0.0, 1.0,
        )
        entry["smooth"] = {
            "clean": {
                "psnr_nearest": round(psnr(base, smooth_hr), 2),
                "psnr_sr": round(psnr(pred, smooth_hr), 2),
                "gain_db": round(psnr(pred, smooth_hr) - psnr(base, smooth_hr), 2),
            }
        }
        log(
            f"{fam_name:22s} smooth clean   : nearest "
            f"{entry['smooth']['clean']['psnr_nearest']:6.2f} -> sr "
            f"{entry['smooth']['clean']['psnr_sr']:6.2f}  "
            f"({entry['smooth']['clean']['gain_db']:+.2f} dB)"
        )
        for dname, dcfg in dists.items():
            deg, clean, _ = synthetic_batch(jax.random.PRNGKey(args.seed), args.n, dcfg)
            sub = {}
            for mode, src in (("clean", clean), ("degraded", deg)):
                lo = src.reshape(args.n, args.size // s, s, args.size // s, s, 3).mean(axis=(2, 4))
                base = jnp.repeat(jnp.repeat(lo, s, axis=1), s, axis=2)
                pred = jnp.clip(
                    family.apply(params, lo.astype(jnp.bfloat16), cfgm).astype(jnp.float32),
                    0.0, 1.0,
                )
                sub[mode] = {
                    "psnr_nearest": round(psnr(base, clean), 2),
                    "psnr_sr": round(psnr(pred, clean), 2),
                    "gain_db": round(psnr(pred, clean) - psnr(base, clean), 2),
                }
                log(
                    f"{fam_name:22s} {dname:6s} {mode:8s}: nearest "
                    f"{sub[mode]['psnr_nearest']:6.2f} -> sr {sub[mode]['psnr_sr']:6.2f}  "
                    f"({sub[mode]['gain_db']:+.2f} dB)"
                )
            entry[dname] = sub
        report[fam_name] = entry

    print(json.dumps({"n": args.n, "size": args.size, "families": report}))


if __name__ == "__main__":
    main()
