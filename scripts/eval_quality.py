"""Full quality table over the shipped weights: every family on both held-out
distributions, plus the OOD summary. One JSON on stdout; human table on
stderr. This is the reproducible source for BASELINE.md's quality numbers.

Usage:
    python scripts/eval_quality.py [--n 8] [--seeds 4] [--size 128]
                                   [--seed 999001]

Runs on CPU by design (evaluation must not contend with a serving/training
TPU); the serving dtype (bf16) is used for every forward.

Distributions:
  rich   — DataConfig(photo=False): the round-2 held-out generator
  photo  — DataConfig(photo=True): the round-3 training distribution
           (photographic physics + creative grades + periodic texture)

SR families report gain over nearest-neighbor upsampling of the
2x2-box-downscaled clean (pure SR) AND of the degraded input (joint
restoration+SR, the tests/test_quality.py gate semantics).

Metric (upgraded 2026-08-19): ``gain_db`` is the MEAN PER-IMAGE PSNR gain
over the damage rows of ``--seeds`` independent batches. The original
single-batch aggregate had two defects the promotion validator inherited:
(a) aggregate PSNR is mse-weighted, so one hard image dominates the axis
(a measured 1.3 dB "photo regression" between two candidates reduced to
0.16 dB at 6x the sample size — within tolerance, flipping a HOLD); and
(b) synthetic_batch keeps ~10% of rows clean for identity training, and a
"gain" measured against an identical input is quantization noise, not
restoration. Damage rows = per-image input PSNR < 48 dB. The aggregate is
still reported as ``agg_gain_db`` for continuity with earlier tables.
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
    ap.add_argument("--seeds", type=int, default=4, help="independent batches per axis")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=999_001)
    ap.add_argument("--family", action="append", default=None,
                    help="repeatable; restrict to these families (default: all). "
                         "On the 1-core eval box a full 5-family 4-seed pass "
                         "takes tens of minutes; the promotion validator only "
                         "needs the family under test.")
    args = ap.parse_args()

    def family_wanted(name):
        return args.family is None or name in args.family

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

    def per_image_psnr(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        mse = np.maximum(np.mean(np.square(a - b), axis=(1, 2, 3)), 1e-10)
        return 10.0 * np.log10(1.0 / mse)

    DAMAGE_PSNR_MAX = 48.0  # rows above this are identity rows, not damage

    def gain_stats(pin_rows, pout_rows, damage_only=True):
        """(mean per-image gain over damage rows, aggregate-equivalent gain,
        number of rows used)."""
        pin_rows = np.concatenate(pin_rows)
        pout_rows = np.concatenate(pout_rows)
        sel = pin_rows < DAMAGE_PSNR_MAX if damage_only else np.ones_like(pin_rows, bool)
        used = int(sel.sum())
        mean_gain = float(np.mean(pout_rows[sel] - pin_rows[sel])) if used else 0.0
        # aggregate over every row (the legacy metric): reconstruct from
        # per-image mse means
        mse_in = np.mean(10.0 ** (-pin_rows / 10.0))
        mse_out = np.mean(10.0 ** (-pout_rows / 10.0))
        agg = 10.0 * np.log10(max(mse_in, 1e-10) / max(mse_out, 1e-10))
        return mean_gain, float(agg), used

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    dists = {
        "rich": DataConfig(size=args.size),
        "photo": DataConfig(size=args.size, photo=True),
    }
    report: dict = {}

    for fam_name in ("restore-unet", "restore-unet-small", "diffusion-restore"):
        if not family_wanted(fam_name):
            continue
        family = get_family(fam_name)
        path = W.weights_path(fam_name)
        if not os.path.exists(path):
            continue
        template = family.init(jax.random.PRNGKey(0), family.config)
        params = W.load_params(template, path)
        entry = {}
        for dname, dcfg in dists.items():
            pins, pouts = [], []
            for k in range(args.seeds):
                deg, clean, cond = synthetic_batch(
                    jax.random.PRNGKey(args.seed + k), args.n, dcfg
                )
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
                pins.append(per_image_psnr(deg, clean))
                pouts.append(per_image_psnr(pred, clean))
            gain, agg, used = gain_stats(pins, pouts)
            entry[dname] = {
                "gain_db": round(gain, 2),
                "agg_gain_db": round(agg, 2),
                "damage_rows": used,
            }
            log(
                f"{fam_name:22s} {dname:6s}: per-image {gain:+.2f} dB over "
                f"{used} damage rows (agg {agg:+.2f})"
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
        if not family_wanted(fam_name):
            continue
        family = get_family(fam_name)
        path = W.weights_path(fam_name)
        if not os.path.exists(path):
            continue
        cfgm = family.config
        s = cfgm.scale
        template = family.init(jax.random.PRNGKey(0), cfgm)
        params = W.load_params(template, path)
        entry = {}

        def sr_forward(lo):
            return jnp.clip(
                family.apply(params, lo.astype(jnp.bfloat16), cfgm).astype(jnp.float32),
                0.0, 1.0,
            )

        pins, pouts = [], []
        for k in range(args.seeds):
            smooth_hr = smooth_batch(args.seed + 9000 + k, args.n, args.size)
            lo = smooth_hr.reshape(
                args.n, args.size // s, s, args.size // s, s, 3
            ).mean(axis=(2, 4))
            base = jnp.repeat(jnp.repeat(lo, s, axis=1), s, axis=2)
            pred = sr_forward(lo)
            pins.append(per_image_psnr(base, smooth_hr))
            pouts.append(per_image_psnr(pred, smooth_hr))
        gain, agg, used = gain_stats(pins, pouts, damage_only=False)
        entry["smooth"] = {"clean": {"gain_db": round(gain, 2), "agg_gain_db": round(agg, 2)}}
        log(f"{fam_name:22s} smooth clean   : per-image {gain:+.2f} dB (agg {agg:+.2f})")

        for dname, dcfg in dists.items():
            sub = {m: ([], []) for m in ("clean", "degraded")}
            for k in range(args.seeds):
                deg, clean, _ = synthetic_batch(
                    jax.random.PRNGKey(args.seed + k), args.n, dcfg
                )
                for mode, src in (("clean", clean), ("degraded", deg)):
                    lo = src.reshape(
                        args.n, args.size // s, s, args.size // s, s, 3
                    ).mean(axis=(2, 4))
                    base = jnp.repeat(jnp.repeat(lo, s, axis=1), s, axis=2)
                    pred = sr_forward(lo)
                    sub[mode][0].append(per_image_psnr(base, clean))
                    sub[mode][1].append(per_image_psnr(pred, clean))
            entry[dname] = {}
            for mode, (pi, po) in sub.items():
                # every row is a meaningful SR task (a kept-clean row's
                # "degraded" input is just the downscaled clean)
                gain, agg, _ = gain_stats(pi, po, damage_only=False)
                entry[dname][mode] = {"gain_db": round(gain, 2), "agg_gain_db": round(agg, 2)}
                log(
                    f"{fam_name:22s} {dname:6s} {mode:8s}: per-image {gain:+.2f} dB "
                    f"(agg {agg:+.2f})"
                )
        report[fam_name] = entry

    print(
        json.dumps(
            {"n": args.n, "seeds": args.seeds, "size": args.size, "families": report}
        )
    )


if __name__ == "__main__":
    main()
