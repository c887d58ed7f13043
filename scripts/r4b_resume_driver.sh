#!/bin/bash
# Round-4 resume driver (the VM restart at 11:43 UTC killed r4_chip_driver.sh
# after its bench step). Picks up exactly where it died:
#   1. pipeline-depth A/B through the real HTTP stack (scripts/loadtest.py
#      against a live server — the original driver forgot to start one)
#   2. flagship DECONV+GRAIN retrain (VERDICT r3 #4) into a STAGING weights
#      dir (shipped npz untouched until gates pass), interim export every
#      4000 steps so a kill loses at most one chunk
# SR/diffusion/small phases are launched separately after the flagship
# validates — keeping this script short keeps every phase resumable.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4b}
mkdir -p "$LOGDIR"
STAGE=${STAGE:-$PWD/.staging_weights}
mkdir -p "$STAGE"
# seed warm-start from the shipped weights; never clobber a newer staging npz
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

wait_chip

# --- 1. pipeline-depth A/B over HTTP (needs ADMIN_DEV_OPEN for the credit
#        grant; that hatch now also requires ALLOW_DEGRADED — dev-only run) ---
if [ "${SKIP_LOADTEST:-0}" != "1" ]; then
  for d in 2 1; do
    env SERVE_PIPELINE_DEPTH=$d SERVE_WARMUP=512 ADMIN_DEV_OPEN=1 ALLOW_DEGRADED=1 \
      python -m image_restoration_platform_tpu.api > "$LOGDIR/server_d$d.log" 2>&1 &
    SRV=$!
    up=0
    for _ in $(seq 1 150); do
      curl -fsS -o /dev/null localhost:8080/health/live 2>/dev/null && { up=1; break; }
      kill -0 $SRV 2>/dev/null || break
      sleep 5
    done
    if [ "$up" = "1" ]; then
      timeout 900 python scripts/loadtest.py http://localhost:8080 96 16 \
        > "$LOGDIR/loadtest_d$d.log" 2>&1
    fi
    kill $SRV 2>/dev/null
    wait $SRV 2>/dev/null
    sleep 20
  done
fi

# --- 2. flagship deconv retrain into staging ---
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
      return 0
    fi
    # timeout-kill with interim exports in staging still counts as progress;
    # only retry when the run died early (no interim export logged)
    if grep -q "interim export" "$LOGDIR/$log.try$attempt.log"; then
      return 0
    fi
    attempt=$((attempt + 1))
    sleep 120
  done
  return 1
}

run_phase unet_deconv128 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_MIX_RICH=0.25 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=5e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=4000
sleep 60
run_phase unet_deconv256 TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_MIX_RICH=0.25 \
  TRAIN_STEPS=3000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=1.5e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=1000

echo DONE > "$LOGDIR/FLAGSHIP_DONE"
