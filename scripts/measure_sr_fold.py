"""A/B the W-folded SR serving path on the real chip: per-batch sr step and
the warm 2K->4K tiled path (BASELINE config 3).

Uses chain-differenced timing with a device_get sync — block_until_ready does
not serialize dispatched work on this TPU stack (docs/STATUS.md measurement
notes). Run only when no other process owns the chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from image_restoration_platform_tpu.config import ServingConfig  # noqa: E402
from image_restoration_platform_tpu.serve.engine import RestorationEngine  # noqa: E402

rng = np.random.default_rng(0)
tiles = rng.integers(0, 256, (8, 256, 256, 3), dtype=np.uint8)
canvas2k = rng.integers(0, 256, (2048, 2048, 3), dtype=np.uint8)


def measure(fold: bool) -> float:
    cfg = ServingConfig(size_buckets=(256,), max_batch=8, fold_w_sr=fold)
    eng = RestorationEngine(serving_config=cfg)
    eng.sr_batch(tiles, "sr-x2")  # warm (compile or disk-cache load)
    params = eng._params("sr-x2")
    key = next(k for k in eng._compiled if isinstance(k, tuple) and k[0] == ("sr", "sr-x2"))
    exe = eng._compiled[key]
    d = jax.device_put(tiles)
    out = exe(params, d)
    _ = jax.device_get(out[:1, :1, :1])

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = exe(params, d)
        _ = jax.device_get(o[:1, :1, :1])
        return time.perf_counter() - t0

    chain(1)
    per = min((chain(20) - chain(1)) / 19 for _ in range(2))
    print(f"fold={fold}: sr-x2 b8 256px step {per*1000:.2f} ms = {per/8*1000:.3f} ms/tile", flush=True)

    eng.sr_tiled(canvas2k, "sr-x2")  # warm
    best, meta = None, None
    for _ in range(3):
        t0 = time.perf_counter()
        _up, meta = eng.sr_tiled(canvas2k, "sr-x2")
        w = time.perf_counter() - t0
        best = w if best is None or w < best else best
    print(
        f"fold={fold}: sr_tiled 2K->4K warm wall {best:.2f}s "
        f"device+transfer {meta['deviceSeconds']*1000:.0f} ms",
        flush=True,
    )
    return per


if __name__ == "__main__":
    import json

    from image_restoration_platform_tpu.utils.measure_guard import guarded

    with guarded() as g:  # host-clock A/B: stamp validity (VERDICT r4 item 5)
        p_on = measure(True)
        p_off = measure(False)
    print(f"fold speedup on the sr step: {p_off/p_on:.2f}x")
    print(json.dumps(g.stamp({
        "fold_ms": round(p_on * 1e3, 2), "unfold_ms": round(p_off * 1e3, 2),
        "speedup": round(p_off / p_on, 3),
    })), flush=True)
