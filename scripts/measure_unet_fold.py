"""A/B the W-folded flagship (restore-unet) serving path on the real chip,
with the fold-preserving decoder (models/folded.py upconv2d_folded).

Measures the restore bucket step at 512px b8 — the BASELINE headline shape —
folded vs unfolded, using chain-differenced timing with a device_get sync
(block_until_ready does not serialize dispatched work on this TPU stack;
docs/STATUS.md measurement notes). Run only when no other process owns the
chip.

Usage:  python scripts/measure_unet_fold.py [--batch 8] [--size 512]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from image_restoration_platform_tpu.config import ServingConfig  # noqa: E402
from image_restoration_platform_tpu.serve.engine import RestorationEngine  # noqa: E402


def measure(fold: bool, size: int, batch: int) -> float:
    cfg = ServingConfig(size_buckets=(size,), max_batch=batch, fold_w=fold)
    eng = RestorationEngine(serving_config=cfg)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    eng.restore_batch(imgs)  # warm (compile or disk-cache load)

    key = next(k for k in eng._compiled if isinstance(k, tuple) and k[0] == "restore-unet")
    exe = eng._compiled[key]
    params = eng._params("restore-unet")
    stacked = np.stack(imgs)
    d = jax.device_put(stacked)
    valid = jax.device_put(np.tile(np.asarray([[size, size]], np.int32), (batch, 1)))
    is_jpeg = jax.device_put(np.ones((batch,), np.float32))
    out = exe(params, d, valid, is_jpeg)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = exe(params, d, valid, is_jpeg)
        _ = jax.device_get(jax.tree_util.tree_leaves(o)[0])
        return time.perf_counter() - t0

    chain(1)
    per = min((chain(20) - chain(1)) / 19 for _ in range(2))
    print(
        f"fold={int(fold)}: restore {size}px b{batch} step {per*1000:.2f} ms"
        f" = {per/batch*1000:.3f} ms/img",
        flush=True,
    )
    return per


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import json

    from image_restoration_platform_tpu.utils.measure_guard import guarded

    with guarded() as g:  # host-clock A/B: stamp validity (VERDICT r4 item 5)
        p_on = measure(True, args.size, args.batch)
        p_off = measure(False, args.size, args.batch)
    print(f"flagship fold speedup: {p_off/p_on:.2f}x", flush=True)
    print(json.dumps(g.stamp({
        "fold_ms": round(p_on * 1e3, 2), "unfold_ms": round(p_off * 1e3, 2),
        "speedup": round(p_off / p_on, 3),
    })), flush=True)
