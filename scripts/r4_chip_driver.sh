#!/bin/bash
# Round-4 chip queue (VERDICT r3 next #1/#3/#4/#7), in priority order:
#   1. wait for chip health
#   2. flagship fold A/B (scripts/measure_unet_fold.py) — decides SERVE_FOLD_W
#   3. one bench.py pass: warms the executable disk cache, records the
#      yuv420 2K->4K wall + device-only MFU on chip
#   4. pipeline-depth A/B through the HTTP stack (scripts/loadtest.py)
#   5. retrains, highest product value first:
#        a. flagship DECONV emphasis (real deblur/dejpeg capability,
#           TRAIN_DATA_DECONV=1) @128 then a short 256 top-up
#        b. sr-x2 / sr-x4 mixed-distribution reruns
#        c. diffusion photo finish
#        d. small mixed top-up
#      Each phase retried once and skipped past CUTOFF_EPOCH. Weights export
#      to weights/ — validate with scripts/eval_quality.py + eval_ood.py and
#      the quality test files BEFORE committing any npz.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4_chip}
mkdir -p "$LOGDIR"
CUTOFF_EPOCH=${CUTOFF_EPOCH:-0}

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

# --- measurements (fast; each its own chip session) ---
timeout 3600 python scripts/measure_unet_fold.py > "$LOGDIR/fold.log" 2>&1
sleep 60
wait_chip
timeout 3600 python bench.py > "$LOGDIR/bench.json" 2> "$LOGDIR/bench.log"
sleep 60
wait_chip
timeout 1800 env SERVE_PIPELINE_DEPTH=2 python scripts/loadtest.py > "$LOGDIR/loadtest_d2.log" 2>&1
sleep 30
wait_chip
timeout 1800 env SERVE_PIPELINE_DEPTH=1 python scripts/loadtest.py > "$LOGDIR/loadtest_d1.log" 2>&1
sleep 60

# --- training queue ---
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

run_phase unet_deconv128 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_MIX_RICH=0.25 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=5e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=10000
run_phase unet_deconv256 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_MIX_RICH=0.25 \
  TRAIN_STEPS=3000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=1.5e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0
wait_chip
timeout 3600 python scripts/eval_ood.py > "$LOGDIR/ood_after_deconv.log" 2>&1
timeout 3600 python scripts/eval_ood.py --corpus real > "$LOGDIR/real_after_deconv.log" 2>&1
timeout 3600 python scripts/eval_quality.py > "$LOGDIR/quality_after_deconv.log" 2>&1

run_phase srx2_mix TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=12500
run_phase srx4_mix TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=12500
run_phase diffusion_finish TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=25000 TRAIN_BATCH=8 \
  TRAIN_SIZE=128 TRAIN_LR=5e-5 TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=12500
run_phase small_mix TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=30000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=8e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000
echo DONE > "$LOGDIR/ALL_DONE"
