"""Tunnel-degradation-tolerant device timing of the REAL serving program.

The chain-differenced host timing in measure_segments.py / bench.py needs a
healthy D2H path: its sync fetch stalls unpredictably when the axon tunnel
degrades (observed twice on 2026-08-19: 'unfolded 2003 ms/step' garbage).
This harness instead wraps N launches of RestorationEngine.restore_batch —
the actual fused serving program, deblur stage included — in a
jax.profiler.trace and reads MODULE DEVICE TIME from the chip's own event
clocks (scripts/parse_xplane.summarize_xspace), which the tunnel cannot
corrupt.

Variants:
  deblur1_fold1  the shipping default (SERVE_DEBLUR=1, SERVE_FOLD_W=1)
  deblur0_fold1  deblur stage ablated -> the spectral probe's device cost
  deblur0_fold0  canonical unfolded   -> the fold's whole-program advantage

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
        # shipping default: deblock + deblur gates + folded backbone
        "full": ServingConfig(size_buckets=(S,), max_batch=N,
                              deblur=True, deblock=True, fold_w=True),
        # deblock ablated -> the quant-estimation gate's device cost
        "deblock0": ServingConfig(size_buckets=(S,), max_batch=N,
                                  deblur=True, deblock=False, fold_w=True),
        # both stages ablated -> the spectral deblur probe's device cost
        "stages0": ServingConfig(size_buckets=(S,), max_batch=N,
                                 deblur=False, deblock=False, fold_w=True),
        # canonical unfolded -> the fold's whole-program advantage
        "unfolded": ServingConfig(size_buckets=(S,), max_batch=N,
                                  deblur=False, deblock=False, fold_w=False),
    }

    results = {}
    for name, cfg in variants.items():
        engine = RestorationEngine(serving_config=cfg)
        t0 = time.time()
        engine.restore_batch(canvas, valid, jpeg_f, "restore-unet")  # compile/warm
        engine.restore_batch(canvas, valid, jpeg_f, "restore-unet")
        warm_s = time.time() - t0
        tdir = os.path.join(TRACE_ROOT, name)
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(REPS):
                engine.restore_batch(canvas, valid, jpeg_f, "restore-unet")
        payload = summarize_xspace(tdir, verbose=False)
        plane = next(iter(payload["planes"].values()))
        step_ms = plane["modules_ms"] / REPS
        results[name] = {
            "step_ms": round(step_ms, 3),
            "ms_per_img": round(step_ms / N, 4),
            "module_runs": plane["module_runs"],
            "reps": REPS,
            "warm_s": round(warm_s, 1),
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    if {"full", "deblock0", "stages0", "unfolded"} <= results.keys():
        fu = results["full"]["step_ms"]
        k0 = results["deblock0"]["step_ms"]
        s0 = results["stages0"]["step_ms"]
        uf = results["unfolded"]["step_ms"]
        print(f"\ndeblock gate device cost : {fu - k0:6.2f} ms/step "
              f"({(fu - k0) / N:.3f} ms/img)", flush=True)
        print(f"deblur probe device cost : {k0 - s0:6.2f} ms/step "
              f"({(k0 - s0) / N:.3f} ms/img)", flush=True)
        print(f"fold whole-program gain  : {uf / s0:6.2f}x "
              f"({uf:.2f} -> {s0:.2f} ms/step, no stages)", flush=True)
        print(f"serving default ms/img   : {fu / N:6.3f}", flush=True)


if __name__ == "__main__":
    main()
