"""Profile the fused 512px b8 restore program on the real chip: per-op
breakdown via jax.profiler trace + precise repeat-launch timing."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.serve import RestorationEngine

import jax

print("devices:", jax.devices(), flush=True)
cfg = ServingConfig(size_buckets=(512,), max_batch=8)
engine = RestorationEngine(serving_config=cfg)

rng = np.random.default_rng(0)
canvas = rng.integers(0, 256, (8, 512, 512, 3), dtype=np.uint8)
valid = np.tile(np.asarray([[512, 512]], np.int32), (8, 1))
jpeg_f = np.ones((8,), np.float32)

t0 = time.time()
engine.restore_batch(canvas, valid, jpeg_f, "restore-unet")
print(f"warm (compile/load): {time.time()-t0:.1f}s", flush=True)

# precise device timing: launch the cached executable directly, block at end
params = engine._params("restore-unet")
key_sig = next(k for k in engine._compiled if isinstance(k, tuple) and k[0] == "restore-unet")
exe = engine._compiled[key_sig]
imgs_d = jax.device_put(canvas)
args = (imgs_d, valid, jpeg_f)

from image_restoration_platform_tpu.utils.measure_guard import guarded  # noqa: E402

with guarded() as _g:  # host-clock step timing: stamp validity (r4 item 5)
    for _ in range(2):
        out, scores = exe(params, *args)
        jax.block_until_ready(out)
    REPS = 20
    t0 = time.perf_counter()
    for _ in range(REPS):
        out, scores = exe(params, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
print(f"b8 512px fused step: {dt*1000:.2f} ms/step = {dt/8*1000:.3f} ms/img", flush=True)

import json  # noqa: E402

print(json.dumps(_g.stamp({"step_ms": round(dt * 1e3, 2)})), flush=True)

trace_dir = "/tmp/irp_prof"
try:
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out, scores = exe(params, *args)
        jax.block_until_ready(out)
    print("trace written to", trace_dir, flush=True)
except Exception as e:
    print("profiler failed:", type(e).__name__, e, flush=True)
