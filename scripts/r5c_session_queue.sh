#!/bin/bash
# Round-4 continuation session queue (2026-08-20): the r5a payloads with a
# TWO-TIER tunnel probe. The 08-19 relapses showed the tunnel has three
# modes — healthy (bulk D2H > 30 MB/s), degraded (D2H ~0.6 MB/s but alive),
# stalled (even scalar fetches hang). Training only needs "alive" (the
# trainer fetches loss scalars and one 22 MB npz export); host-timed bench
# and loadtest need "healthy". r5a's single strict probe blocked training
# during degraded windows for no reason.
#
#   probe_alive:   1 MB D2H completes within 60 s  -> training OK
#   probe_healthy: 12 MB D2H completes within 5 s  -> bench/loadtest OK
#
# Payloads (from scripts/r5a_chip_queue.sh / docs/STATUS.md "Open for r5"):
#   1. flagship compression-solo chunks (dejpeg residual: jpeg-only inputs
#      were a ~0.8% tail under bernoulli-0.5 degradation activation)
#   2. sr-x2 smooth + clean top-up (smooth-hallucination xfail + clean loss
#      vs nearest)
#   3. measure_step_profiled.py (device-clock, tunnel-immune)
#   4. bench.py headline (healthy tunnel only)
# Training exports go to staging dirs; shipped npz untouched until
# scripts/validate_staging.py (CPU, run separately) says PROMOTE.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r5c}
mkdir -p "$LOGDIR"
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch)}

probe_alive() {
  timeout 90 python - <<'EOF' > /dev/null 2>&1
import time, jax, numpy as np
assert jax.devices()[0].platform != "cpu"
a = np.random.default_rng(int(time.time()) % 2**31).integers(
    0, 255, (512, 512, 4), dtype=np.uint8)
d = jax.device_put(a); d.block_until_ready()
t0 = time.perf_counter()
np.asarray(d)
assert time.perf_counter() - t0 < 60.0
EOF
}

probe_healthy() {
  timeout 180 python - <<'EOF' > /dev/null 2>&1
import time, jax, numpy as np
assert jax.devices()[0].platform != "cpu"
a = np.random.default_rng(int(time.time()) % 2**31).integers(
    0, 255, (1024, 1024, 12), dtype=np.uint8)
d = jax.device_put(a); d.block_until_ready()
t0 = time.perf_counter()
np.asarray(d)
assert time.perf_counter() - t0 < 5.0
EOF
}

remain() { echo $((CUTOFF_EPOCH - $(date +%s))); }

wait_alive() {
  until probe_alive; do
    echo "not-alive at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
    [ "$(remain)" -le 300 ] && return 1
    sleep 60
  done
  return 0
}

# ---- phase 1: flagship compression-solo chunks ------------------------------
STAGE=$PWD/.staging_compsolo
mkdir -p "$STAGE"
if [ ! -e "$STAGE/restore-unet.chunk0.npz" ]; then
  cp weights/restore-unet.npz "$STAGE/restore-unet.npz"
  cp weights/restore-unet.npz "$STAGE/restore-unet.chunk0.npz"
fi
for chunk in 1 2 3; do
  [ -e "$STAGE/restore-unet.chunk$chunk.npz" ] && continue
  [ "$(remain)" -le 600 ] && break
  wait_alive || break
  timeout "$(remain)" env IRP_WEIGHTS_DIR="$STAGE" \
    TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_MILD=0.5 TRAIN_DATA_MIX_RICH=0.2 TRAIN_DATA_COMP_SOLO=0.3 \
    TRAIN_DATA_LOWLIGHT_SOLO=0.18 \
    TRAIN_STEPS=4000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
    TRAIN_LR=2e-5 TRAIN_IDENTITY_WEIGHT=6.0 TRAIN_SEED=52$chunk \
    python -m image_restoration_platform_tpu.train \
    > "$LOGDIR/flagship_chunk$chunk.log" 2>&1
  grep -q "training done" "$LOGDIR/flagship_chunk$chunk.log" || break
  cp "$STAGE/restore-unet.npz" "$STAGE/restore-unet.chunk$chunk.npz"
done
touch "$LOGDIR/flagship.done"

# ---- phase 2: sr-x2 smooth + clean top-up -----------------------------------
SSTAGE=$PWD/.staging_srsmooth
mkdir -p "$SSTAGE"
if [ ! -e "$SSTAGE/sr-x2.chunk0.npz" ]; then
  cp weights/sr-x2.npz "$SSTAGE/sr-x2.npz"
  cp weights/sr-x2.npz "$SSTAGE/sr-x2.chunk0.npz"
fi
for chunk in 1 2 3; do
  [ -e "$SSTAGE/sr-x2.chunk$chunk.npz" ] && continue
  [ "$(remain)" -le 450 ] && break
  wait_alive || break
  timeout "$(remain)" env IRP_WEIGHTS_DIR="$SSTAGE" \
    TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.28 \
    TRAIN_DATA_MIX_MILD=0.35 TRAIN_DATA_MIX_RICH=0.3 \
    TRAIN_DATA_CLEAN_FRACTION=0.30 \
    TRAIN_STEPS=2000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1.5e-5 \
    TRAIN_SEED=53$chunk \
    python -m image_restoration_platform_tpu.train \
    > "$LOGDIR/srx2_chunk$chunk.log" 2>&1
  grep -q "training done" "$LOGDIR/srx2_chunk$chunk.log" || break
  cp "$SSTAGE/sr-x2.npz" "$SSTAGE/sr-x2.chunk$chunk.npz"
done
touch "$LOGDIR/srx2.done"

# ---- phase 2b: attention kernel autotune (device clocks) --------------------
if [ ! -e "$LOGDIR/attn.done" ] && [ "$(remain)" -gt 600 ]; then
  if wait_alive; then
    timeout 1800 python scripts/measure_attention.py > "$LOGDIR/attn.log" 2>&1
    echo "rc=$?" >> "$LOGDIR/attn.log"
  fi
  touch "$LOGDIR/attn.done"
fi

# ---- phase 3: device-clock variant table (tunnel-immune) --------------------
if [ ! -e "$LOGDIR/profiled.done" ] && [ "$(remain)" -gt 600 ]; then
  if wait_alive; then
    timeout "$(remain)" python scripts/measure_step_profiled.py \
      > "$LOGDIR/profiled.log" 2>&1
    echo "rc=$?" >> "$LOGDIR/profiled.log"
  fi
  touch "$LOGDIR/profiled.done"
fi

# ---- phase 4: bench headline (healthy tunnel only) --------------------------
if [ ! -e "$LOGDIR/bench.done" ] && [ "$(remain)" -gt 300 ]; then
  if probe_healthy; then
    timeout "$(remain)" python bench.py > "$LOGDIR/bench.log" 2>&1
    echo "rc=$?" >> "$LOGDIR/bench.log"
    touch "$LOGDIR/bench.done"
  fi
fi

echo DONE > "$LOGDIR/ALL_DONE"
