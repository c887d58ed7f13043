"""Chain-differenced device timing of the fused serving program's segments.

The fused 512px b8 step measures 18.65 ms (2.33 ms/img) at ~38% honest MFU
(BASELINE.md round-4). To target <2.0 ms/img we need to know where the
non-MXU time lives; whole-program traces through the tunnel are awkward to
parse, so this times ABLATED programs instead (each compiled + disk-cached
like serving):

  full        classify+condition -> folded UNet -> byte egress  (the real step)
  no_classify fixed conditioning -> folded UNet -> byte egress
  no_unet     classify+condition -> byte egress (no backbone)
  unet_f32io  folded UNet alone, bf16 in/out on device arrays (no u8 conv)
  unfolded    classify+condition -> UNFOLDED UNet -> byte egress

Differences bound each stage's cost. Timing: 20 reps, block at end only
(chain-differenced: per-rep cost = (t_block - t0)/reps on a chip where
dispatch is cheap relative to step time), plus a device_get sync before t0.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from image_restoration_platform_tpu.classify.fused import batch_classify_and_condition
from image_restoration_platform_tpu.models import folded, get_family
from image_restoration_platform_tpu.models import weights as W

print("devices:", jax.devices(), flush=True)

family = get_family("restore-unet")
cfg = family.config
params_u = W.load_params(family.init(jax.random.PRNGKey(0), cfg), W.weights_path("restore-unet"))
params_f = folded.fold_params(params_u, cfg)

N, S = 8, 512
rng = np.random.default_rng(0)
canvas = jax.device_put(rng.integers(0, 256, (N, S, S, 3), dtype=np.uint8))
valid = jax.device_put(np.tile(np.asarray([[S, S]], np.int32), (N, 1)))
jpeg_f = jax.device_put(np.ones((N,), np.float32))
x_bf16 = jax.device_put((rng.random((N, S, S, 3)).astype(np.float32)).astype(jnp.bfloat16))
cond_fixed = jax.device_put(np.zeros((N, 28), np.float32))


def full(p, c, v, j):
    scores, cond = batch_classify_and_condition(c.astype(jnp.float32), v, j)
    x = c.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    out = folded.apply(p, x, cond.astype(jnp.bfloat16), config=cfg)
    out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
    return jnp.round(out * 255.0).astype(jnp.uint8), scores


def no_classify(p, c):
    x = c.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    out = folded.apply(p, x, cond_fixed.astype(jnp.bfloat16), config=cfg)
    out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
    return jnp.round(out * 255.0).astype(jnp.uint8)


def no_unet(c, v, j):
    scores, cond = batch_classify_and_condition(c.astype(jnp.float32), v, j)
    x = c.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    out = x + cond.astype(jnp.bfloat16).sum() * jnp.bfloat16(1e-12)
    out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
    return jnp.round(out * 255.0).astype(jnp.uint8), scores


def unet_f32io(p, x):
    return folded.apply(p, x, cond_fixed.astype(jnp.bfloat16), config=cfg)


def unfolded(p, c, v, j):
    scores, cond = batch_classify_and_condition(c.astype(jnp.float32), v, j)
    x = c.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    out = family.apply(p, x, cond.astype(jnp.bfloat16), config=cfg)
    out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
    return jnp.round(out * 255.0).astype(jnp.uint8), scores


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)  # compile + warm
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:12s}: {dt*1000:8.2f} ms/step  {dt/N*1000:6.3f} ms/img", flush=True)
    return dt


from image_restoration_platform_tpu.utils.measure_guard import guarded  # noqa: E402

# host-clock timing: validity requires a healthy tunnel before AND after
# (VERDICT r4 item 5 — two of the three invalid r4 sessions were this script)
with guarded() as g:
    t_full = timeit("full", full, params_f, canvas, valid, jpeg_f)
    t_nc = timeit("no_classify", no_classify, params_f, canvas)
    t_nu = timeit("no_unet", no_unet, canvas, valid, jpeg_f)
    t_uf = timeit("unet_f32io", unet_f32io, params_f, x_bf16)
    t_un = timeit("unfolded", unfolded, params_u, canvas, valid, jpeg_f)
record = g.stamp({
    "full_ms": round(t_full * 1e3, 2), "no_classify_ms": round(t_nc * 1e3, 2),
    "no_unet_ms": round(t_nu * 1e3, 2), "unet_f32io_ms": round(t_uf * 1e3, 2),
    "unfolded_ms": round(t_un * 1e3, 2),
})

print("\nderived (ms/step):", flush=True)
print(f"  classifier+conditioning ~= full - no_classify = {1000*(t_full-t_nc):.2f}")
print(f"  classifier floor (standalone)                 = {1000*t_nu:.2f}")
print(f"  u8 ingress/egress ~= no_classify - unet_f32io = {1000*(t_nc-t_uf):.2f}")
print(f"  folded UNet core                              = {1000*t_uf:.2f}")
print(f"  fold advantage (unfolded - full)              = {1000*(t_un-t_full):.2f}")

import json  # noqa: E402

print(json.dumps(record), flush=True)
