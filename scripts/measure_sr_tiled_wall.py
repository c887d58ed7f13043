"""Break down the 2K->4K tiled-SR warm wall (BASELINE config 3).

Round-4 recorded 858 ms warm wall for ``engine.sr_tiled(2048px, yuv420)``.
The yuv420 planes are 12.4 MB; at the tunnel's historical ~34 MB/s that is
~365 ms, so ~500 ms is unexplained. This isolates, on the real chip:

  1. raw tunnel D2H bandwidth (device_get of 1/4/12/48 MB u8 arrays — the
     latency + bandwidth calibration everything else is judged against)
  2. sr_tiled device-only step cost (chain-differenced, yuv420 program)
  3. one warm sr_tiled wall, with deviceSeconds/fetchSeconds from the meta
  4. fetch cost of the three planes separately (three device_gets) vs
     jax.device_get of the tuple (one call, possibly serialized RTs)
  5. same wall for output="rgb" (3 B/px) for the bytes-vs-overhead split

Writes human-readable lines to stdout; run as a scripts/chip_queue.py
payload so it never contends with training.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from image_restoration_platform_tpu.utils.measure_guard import guarded  # noqa: E402

_guard = guarded()  # host-clock walls below: stamp validity (VERDICT r4 item 5)
_guard.__enter__()

# ---- 1. raw D2H calibration
for mb in (1, 4, 12, 48):
    arr = jax.device_put(jnp.zeros((mb * 1024 * 1024,), jnp.uint8))
    jax.block_until_ready(arr)
    jax.device_get(arr[:16])  # sync
    t0 = time.perf_counter()
    jax.device_get(arr)
    dt = time.perf_counter() - t0
    print(f"D2H {mb:3d} MB: {dt*1000:7.1f} ms  ({mb/dt:6.1f} MB/s)", flush=True)

# ---- build the engine + canvas
from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.serve import RestorationEngine

cfg = ServingConfig(size_buckets=(512,), max_batch=8)
engine = RestorationEngine(serving_config=cfg)
rng = np.random.default_rng(0)
img = np.clip(rng.normal(0, 20, (512, 512, 3)) + [90, 80, 70], 0, 255).astype(np.uint8)
canvas = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)  # 2048x2048

# ---- warm both egress modes (compile or disk-cache load)
for mode in ("yuv420", "rgb"):
    t0 = time.perf_counter()
    engine.sr_tiled(canvas, "sr-x2", output=mode)
    print(f"sr_tiled {mode} cold/first: {time.perf_counter()-t0:.1f} s", flush=True)

# ---- 3 + 5. warm walls with meta breakdown
for mode in ("yuv420", "rgb"):
    for rep in range(3):
        t0 = time.perf_counter()
        out, meta = engine.sr_tiled(canvas, "sr-x2", output=mode)
        wall = time.perf_counter() - t0
        print(
            f"sr_tiled {mode} warm wall {wall*1000:7.1f} ms | "
            f"deviceSeconds {meta['deviceSeconds']*1000:7.1f} ms | "
            f"fetchSeconds {meta['fetchSeconds']*1000:7.1f} ms",
            flush=True,
        )

# ---- 2. device-only step cost of the yuv420 program (chain-differenced)
params = engine._params("sr-x2")
tag = ("sr_tiled", "sr-x2", 256, 32, 8, "yuv420")
exe = engine._compiled.get(tag)
if exe is None:
    print(f"no cached executable for {tag}; keys: {list(engine._compiled)[:8]}", flush=True)
else:
    canvas_d = jax.device_put(canvas)
    jax.block_until_ready(canvas_d)

    def chain(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = exe(params, canvas_d)
        jax.device_get(o[0][:1, :1])
        return time.perf_counter() - t0

    chain(1)
    reps = 8
    step = min((chain(reps) - chain(1)) / (reps - 1) for _ in range(2))
    print(f"sr_tiled yuv420 device-only: {step*1000:.1f} ms/canvas", flush=True)

    # ---- 4. fetch patterns on the same resident output
    out_d = exe(params, canvas_d)
    jax.block_until_ready(out_d)
    t0 = time.perf_counter()
    planes = jax.device_get(out_d)
    t_tuple = time.perf_counter() - t0
    nbytes = sum(np.asarray(p).nbytes for p in planes)
    print(f"fetch tuple (one call): {t_tuple*1000:.1f} ms for {nbytes/1e6:.1f} MB", flush=True)
    out_d = exe(params, canvas_d)
    jax.block_until_ready(out_d)
    t0 = time.perf_counter()
    for p in out_d:
        jax.device_get(p)
    t_sep = time.perf_counter() - t0
    print(f"fetch planes separately: {t_sep*1000:.1f} ms", flush=True)

import json  # noqa: E402

print(json.dumps(_guard.stamp({"script": "measure_sr_tiled_wall"})), flush=True)
