#!/bin/bash
# Round-5 phase A: the chip queue the round-4 tunnel relapse blocked, plus
# the two training-distribution fixes from docs/STATUS.md "Open for r5":
#
#   1. bench.py headline on the healthy tunnel (round artifact insurance).
#   2. Flagship compression-solo chunks (TRAIN_DATA_COMP_SOLO): the dejpeg
#      residual — backbone harms jpeg-ONLY inputs (-1.38 dB real e2e even
#      with the deblock stage) — is a distribution gap (jpeg-only was a
#      ~0.8% tail under independent bernoulli-0.5 activation).
#   3. sr-x2 smooth + clean top-up (r4p's goal + raised clean_fraction for
#      the clean-downscale loss vs nearest).
#
# Every phase re-probes tunnel health; training exports go to staging dirs
# (shipped npz untouched until scripts/validate_staging.py says PROMOTE —
# promotion runs on CPU and is NOT part of this script).
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r5a}
mkdir -p "$LOGDIR"
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch)}
NICE="nice -n 19"

probe() {
  timeout 180 python - <<'EOF' > /dev/null 2>&1
import time
import jax
import numpy as np
assert jax.devices()[0].platform != "cpu"
a = np.random.default_rng(int(time.time()) % 2**31).integers(
    0, 255, (1024, 1024, 12), dtype=np.uint8)
d = jax.device_put(a); d.block_until_ready()
t0 = time.perf_counter()
np.asarray(d)
assert time.perf_counter() - t0 < 5.0
EOF
}

wait_chip() {
  until probe; do
    echo "unhealthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
    sleep 180
    [ $(($(date +%s))) -ge $((CUTOFF_EPOCH - 600)) ] && return 1
  done
  return 0
}

remain() { echo $((CUTOFF_EPOCH - $(date +%s))); }

# ---- phase 1: bench headline while the tunnel is healthy -------------------
if [ ! -e "$LOGDIR/bench.done" ]; then
  wait_chip && timeout 2400 python bench.py > "$LOGDIR/bench.log" 2>&1
  echo "rc=$?" >> "$LOGDIR/bench.log"
  touch "$LOGDIR/bench.done"
fi

# ---- phase 2: flagship compression-solo chunks ------------------------------
STAGE=$PWD/.staging_compsolo
mkdir -p "$STAGE"
if [ ! -e "$STAGE/restore-unet.chunk0.npz" ]; then
  cp weights/restore-unet.npz "$STAGE/restore-unet.npz"
  cp weights/restore-unet.npz "$STAGE/restore-unet.chunk0.npz"
fi
for chunk in 1 2 3; do
  [ -e "$STAGE/restore-unet.chunk$chunk.npz" ] && continue
  [ "$(remain)" -le 1200 ] && break
  wait_chip || break
  timeout "$(remain)" env IRP_WEIGHTS_DIR="$STAGE" \
    TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_MILD=0.5 TRAIN_DATA_MIX_RICH=0.2 TRAIN_DATA_COMP_SOLO=0.3 \
    TRAIN_STEPS=4000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
    TRAIN_LR=2e-5 TRAIN_IDENTITY_WEIGHT=6.0 TRAIN_SEED=52$chunk \
    python -m image_restoration_platform_tpu.train \
    > "$LOGDIR/flagship_chunk$chunk.log" 2>&1
  grep -q "training done" "$LOGDIR/flagship_chunk$chunk.log" || break
  cp "$STAGE/restore-unet.npz" "$STAGE/restore-unet.chunk$chunk.npz"
done
touch "$LOGDIR/flagship.done"

# ---- phase 3: sr-x2 smooth + clean top-up -----------------------------------
SSTAGE=$PWD/.staging_srsmooth
mkdir -p "$SSTAGE"
if [ ! -e "$SSTAGE/sr-x2.chunk0.npz" ]; then
  cp weights/sr-x2.npz "$SSTAGE/sr-x2.npz"
  cp weights/sr-x2.npz "$SSTAGE/sr-x2.chunk0.npz"
fi
for chunk in 1 2 3; do
  [ -e "$SSTAGE/sr-x2.chunk$chunk.npz" ] && continue
  [ "$(remain)" -le 900 ] && break
  wait_chip || break
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

echo DONE > "$LOGDIR/ALL_DONE"
