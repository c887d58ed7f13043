#!/bin/bash
# Round-4 remaining retrain queue (after the flagship deconv+grain phases
# completed via scripts/r4b_resume_driver.sh): sr-x2 / sr-x4 mixed reruns,
# diffusion photo finish, small mixed top-up — VERDICT r3 next #3.
# All phases train with IRP_WEIGHTS_DIR=.staging_weights (shipped npz
# untouched until the quality gates pass on the staged exports).
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4c}
mkdir -p "$LOGDIR"
STAGE=${STAGE:-$PWD/.staging_weights}
mkdir -p "$STAGE"
for f in weights/*.npz; do
  [ -e "$STAGE/$(basename "$f")" ] || cp "$f" "$STAGE/"
done
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
  local log="$1"; shift
  local now remain
  now=$(date +%s)
  remain=$((CUTOFF_EPOCH - now))
  if [ "$remain" -le 300 ]; then
    echo "cutoff: skipping $log" >> "$LOGDIR/health.log"
    return 1
  fi
  local attempt=1
  while [ "$attempt" -le 2 ]; do
    wait_chip
    now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
    [ "$remain" -le 300 ] && return 1
    timeout "$remain" env IRP_WEIGHTS_DIR="$STAGE" "$@" \
      python -m image_restoration_platform_tpu.train > "$LOGDIR/$log.try$attempt.log" 2>&1
    if grep -q "training done" "$LOGDIR/$log.try$attempt.log"; then
      cp "$LOGDIR/$log.try$attempt.log" "$LOGDIR/$log.log"
      echo "done $log" >> "$LOGDIR/health.log"
      return 0
    fi
    if grep -q "interim export" "$LOGDIR/$log.try$attempt.log"; then
      echo "partial $log (interim export survived)" >> "$LOGDIR/health.log"
      return 0
    fi
    attempt=$((attempt + 1))
    sleep 120
  done
  return 1
}

run_phase srx2_mix TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=12500
sleep 60
run_phase srx4_mix TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=12500
sleep 60
run_phase diffusion_finish TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=25000 TRAIN_BATCH=8 \
  TRAIN_SIZE=128 TRAIN_LR=5e-5 TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=6000
sleep 60
run_phase small_mix TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_MIX_RICH=0.5 \
  TRAIN_STEPS=30000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=10000
echo DONE > "$LOGDIR/ALL_DONE"
