#!/bin/bash
# Round-3 resilient finisher: the 20:22 trainer kill left the TPU tunnel
# unavailable for an extended period and the chained one-shot phase scripts
# (F: SR mixed, G: restore mixed top-ups, H: diffusion finish) burned their
# attempts on backend-init failures. This driver probes chip health first
# and retries each phase until it actually trains.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3z}
mkdir -p "$LOGDIR"

probe() {
  timeout 420 python - <<'EOF' > /dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
import jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(jnp.sum(x)) == 64.0
EOF
}

wait_chip() {
  until probe; do
    echo "chip unavailable; sleeping 120s" >> "$LOGDIR/health.log"
    sleep 180
  done
  echo "chip healthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
}

# run <log> <env...>  — retries until the trainer reaches "training done"
run_phase() {
  local log="$1"; shift
  local attempt=1
  while true; do
    wait_chip
    env "$@" python -m image_restoration_platform_tpu.train > "$LOGDIR/$log.try$attempt.log" 2>&1
    if grep -q "training done" "$LOGDIR/$log.try$attempt.log"; then
      cp "$LOGDIR/$log.try$attempt.log" "$LOGDIR/$log.log"
      break
    fi
    attempt=$((attempt + 1))
    if [ "$attempt" -gt 4 ]; then
      echo "phase $log FAILED after 4 attempts" >> "$LOGDIR/health.log"
      break
    fi
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
run_phase small_mix TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=30000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=8e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000
run_phase unet_mix128 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=30000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=5e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000
run_phase unet_mix256 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=3000 TRAIN_BATCH=8 \
  TRAIN_SIZE=256 TRAIN_LR=1.5e-5 TRAIN_IDENTITY_WEIGHT=4.0
run_phase diffusion TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=25000 TRAIN_BATCH=8 \
  TRAIN_SIZE=128 TRAIN_LR=5e-5 TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=12500
echo DONE > "$LOGDIR/ALL_DONE"
