"""Tunnel-degradation-tolerant device timing of the REAL serving program.

The chain-differenced host timing in measure_segments.py / bench.py needs a
healthy D2H path: its sync fetch stalls unpredictably when the axon tunnel
degrades (observed twice on 2026-08-19: 'unfolded 2003 ms/step' garbage).
This harness instead wraps N launches of RestorationEngine.restore_batch —
the actual fused serving program, deblur stage included — in a
jax.profiler.trace and reads MODULE DEVICE TIME from the chip's own event
clocks (scripts/parse_xplane.summarize_xspace), which the tunnel cannot
corrupt.

Variants (2026-08-19 default set: unfolded, stages on, s2d_io, gated veto):
  default         the shipping default program, RGB egress
  default_yuv420  plane egress (the restore path's shipping output mode)
  s2d0            s2d_io ablated -> full-res bf16 ingress/egress copy tax
  deblock0        deblock ablated -> the quant-estimation gate's device cost
  stages0         both stages ablated -> the spectral probe's device cost
  folded          W-folded whole-program (historical; loses, config.py)

Prints one JSON line per variant and a summary; traces land under
/tmp/irp_prof_steps/<variant>.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)
# must be chosen before ANY google.protobuf import (parse_xplane needs the
# pure-python impl; jax/tf may pull protobuf in during import)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax

from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.serve import RestorationEngine
from parse_xplane import summarize_xspace

REPS = int(os.environ.get("MEASURE_REPS", "8"))
N, S = 8, 512
TRACE_ROOT = os.environ.get("MEASURE_TRACE_ROOT", "/tmp/irp_prof_steps")


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8)
    valid = np.tile(np.asarray([[S, S]], np.int32), (N, 1))
    jpeg_f = np.ones((N,), np.float32)

    variants = {
        # shipping default (2026-08-19 flip set): unfolded + stages +
        # s2d_io + gated veto, RGB egress
        "default": (ServingConfig(size_buckets=(S,), max_batch=N), "rgb"),
        # plane egress -> the restore path's shipping output mode
        "default_yuv420": (ServingConfig(size_buckets=(S,), max_batch=N), "yuv420"),
        # s2d_io ablated -> the full-res bf16 ingress/egress copy tax
        "s2d0": (ServingConfig(size_buckets=(S,), max_batch=N, s2d_io=False), "rgb"),
        # deblock ablated -> the quant-estimation gate's device cost
        "deblock0": (ServingConfig(size_buckets=(S,), max_batch=N, deblock=False), "rgb"),
        # both stages ablated -> the spectral deblur probe's device cost
        "stages0": (ServingConfig(size_buckets=(S,), max_batch=N,
                                  deblur=False, deblock=False), "rgb"),
        # folded whole-program (for the record; loses, config.py fold_w)
        "folded": (ServingConfig(size_buckets=(S,), max_batch=N,
                                 deblur=False, deblock=False, fold_w=True), "rgb"),
    }

    # batch-scaling probe: b16 amortizes fixed per-step costs (stage gates,
    # small-tensor ops); if ms/img drops materially the batcher's
    # max_batch default should follow.
    N16 = 16
    canvas16 = rng.integers(0, 256, (N16, S, S, 3), dtype=np.uint8)
    valid16 = np.tile(np.asarray([[S, S]], np.int32), (N16, 1))
    jpeg16 = np.ones((N16,), np.float32)
    variants["default_b16"] = (
        ServingConfig(size_buckets=(S,), max_batch=N16), "rgb")

    results = {}
    for name, (cfg, egress) in variants.items():
        if name == "default_b16":
            cv, vd, jf, nb = canvas16, valid16, jpeg16, N16
        else:
            cv, vd, jf, nb = canvas, valid, jpeg_f, N
        engine = RestorationEngine(serving_config=cfg)
        t0 = time.time()
        engine.restore_batch(cv, vd, jf, "restore-unet", egress)  # compile/warm
        engine.restore_batch(cv, vd, jf, "restore-unet", egress)
        warm_s = time.time() - t0
        tdir = os.path.join(TRACE_ROOT, name)
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(REPS):
                engine.restore_batch(cv, vd, jf, "restore-unet", egress)
        payload = summarize_xspace(tdir, verbose=False)
        plane = next(iter(payload["planes"].values()))
        step_ms = plane["modules_ms"] / REPS
        results[name] = {
            "step_ms": round(step_ms, 3),
            "ms_per_img": round(step_ms / nb, 4),
            "module_runs": plane["module_runs"],
            "reps": REPS,
            "warm_s": round(warm_s, 1),
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    if {"default", "default_yuv420", "s2d0", "deblock0", "stages0", "folded"} <= results.keys():
        df = results["default"]["step_ms"]
        yv = results["default_yuv420"]["step_ms"]
        s2 = results["s2d0"]["step_ms"]
        k0 = results["deblock0"]["step_ms"]
        s0 = results["stages0"]["step_ms"]
        fo = results["folded"]["step_ms"]
        print(f"\ns2d_io device gain       : {s2 - df:6.2f} ms/step "
              f"({s2:.2f} -> {df:.2f})", flush=True)
        print(f"yuv420 egress device cost: {yv - df:6.2f} ms/step", flush=True)
        print(f"deblock gate device cost : {df - k0:6.2f} ms/step "
              f"({(df - k0) / N:.3f} ms/img)", flush=True)
        print(f"deblur probe device cost : {k0 - s0:6.2f} ms/step "
              f"({(k0 - s0) / N:.3f} ms/img)", flush=True)
        print(f"fold whole-program        : {fo / s0:6.2f}x vs unfolded "
              f"({fo:.2f} vs {s0:.2f} ms/step, no stages)", flush=True)
        print(f"serving default ms/img   : {df / N:6.3f} rgb / {yv / N:6.3f} yuv420",
              flush=True)


if __name__ == "__main__":
    main()
