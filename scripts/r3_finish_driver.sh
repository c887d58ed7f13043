#!/bin/bash
# Round-3 end-game driver (tunnel returned late): measurement first, then
# as much of the training queue as fits.
#   1. wait for chip health
#   2. flagship fold A/B (scripts/measure_unet_fold.py) -> $LOGDIR/fold.log
#   3. SR mixed retrains, flagship/small mixed top-ups, diffusion finish —
#      in priority order, each retried once, skipped past a cutoff time so
#      the chip is free for the round-end bench.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r3_finish}
mkdir -p "$LOGDIR"
CUTOFF_EPOCH=${CUTOFF_EPOCH:-0}   # skip new phases after this (0 = no cutoff)

probe() {
  timeout 420 python - <<'EOF' > /dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

wait_chip() {
  until probe; do
    echo "chip unavailable at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
    sleep 180
  done
  echo "chip healthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
}

past_cutoff() {
  [ "$CUTOFF_EPOCH" -gt 0 ] && [ "$(date +%s)" -ge "$CUTOFF_EPOCH" ]
}

wait_chip
python scripts/measure_unet_fold.py > "$LOGDIR/fold.log" 2>&1
sleep 60

run_phase() {
  local log="$1"; shift
  past_cutoff && { echo "cutoff: skipping $log" >> "$LOGDIR/health.log"; return; }
  local attempt=1
  while [ "$attempt" -le 2 ]; do
    wait_chip
    env "$@" python -m image_restoration_platform_tpu.train > "$LOGDIR/$log.try$attempt.log" 2>&1
    if grep -q "training done" "$LOGDIR/$log.try$attempt.log"; then
      cp "$LOGDIR/$log.try$attempt.log" "$LOGDIR/$log.log"
      break
    fi
    attempt=$((attempt + 1))
    sleep 120
  done
  sleep 120
}

run_phase srx2 TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=25000
run_phase srx4 TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=25000
run_phase unet_mix128 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=30000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=5e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000
run_phase unet_mix256 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=3000 TRAIN_BATCH=8 \
  TRAIN_SIZE=256 TRAIN_LR=1.5e-5 TRAIN_IDENTITY_WEIGHT=4.0
run_phase small_mix TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=30000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=8e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000
run_phase diffusion TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=25000 TRAIN_BATCH=8 \
  TRAIN_SIZE=128 TRAIN_LR=5e-5 TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=12500
echo DONE > "$LOGDIR/ALL_DONE"
