#!/bin/bash
# Round-4 phase G: smooth-heavy SR top-ups. The 50k mixed+smooth runs
# (scripts/r4f_relaunch.sh) moved sr-x2 from 24 -> 38.4 dB on smooth eval
# content — a big step but short of the nearest-parity gate (~44 dB). This
# tops up both SR families from the staged weights with the smooth share
# raised to 0.25 (TRAIN_DATA_SMOOTH_SHARE) at a low LR so the rich/photo
# gains hold while the smooth regression finishes converging.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4g}
mkdir -p "$LOGDIR"
STAGE=$PWD/.staging_weights
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch) for the train watchdog}

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

run_phase() {
  local log="$1" wdir="$2"; shift 2
  local now remain attempt=1
  now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
  [ "$remain" -le 300 ] && { echo "cutoff: skipping $log" >> "$LOGDIR/health.log"; return 1; }
  while [ "$attempt" -le 2 ]; do
    wait_chip
    now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
    [ "$remain" -le 300 ] && return 1
    timeout "$remain" env IRP_WEIGHTS_DIR="$wdir" "$@" \
      python -m image_restoration_platform_tpu.train > "$LOGDIR/$log.try$attempt.log" 2>&1
    if grep -q "training done" "$LOGDIR/$log.try$attempt.log"; then
      cp "$LOGDIR/$log.try$attempt.log" "$LOGDIR/$log.log"
      echo "done $log" >> "$LOGDIR/health.log"
      touch "$LOGDIR/PHASE_${log}_DONE"
      return 0
    fi
    grep -q "interim export" "$LOGDIR/$log.try$attempt.log" && {
      touch "$LOGDIR/PHASE_${log}_DONE"; return 0; }
    attempt=$((attempt + 1))
    sleep 120
  done
  echo "failed $log" >> "$LOGDIR/health.log"
  return 1
}

# ONE TPU client at a time: wait for the r4f queue to release the chip
while [ ! -e /tmp/r4f/ALL_DONE ]; do sleep 60; done

run_phase srx2_smooth25 "$STAGE" TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.25 \
  TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=12000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=3e-5 TRAIN_SEED=301 TRAIN_EXPORT_EVERY=4000
sleep 30
run_phase srx4_smooth25 "$STAGE" TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.25 \
  TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=12000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=3e-5 TRAIN_SEED=302 TRAIN_EXPORT_EVERY=4000

echo DONE > "$LOGDIR/ALL_DONE"
