#!/bin/bash
# Round-4 phase J: full retrain relaunch after the second VM restart wiped the
# staging dirs (r4f-r4i all lost). One script, one TPU client, most-valuable-
# first, with every phase-F/G/I lesson baked into the recipes directly instead
# of being discovered again:
#
#   0. flagship_probe — the CPU-validated conservative recipe (1500 steps
#      b8@96 lr 4e-5 from the SHIPPED r3 npz). A safe promotable candidate
#      within minutes of launch.
#   1. deconv chunks  — the corrected-physics (edge-replicate PSF, 14107fe)
#      deblur/dejpeg retrain, now with the r4i mild-photo interleave BAKED IN
#      (MIX_MILD=0.3, MIX_RICH=0.2) so the mild-damage held-out never regresses
#      in the first place (every pre-rebalance candidate lost ~1.5 dB there).
#      4 x 10k snapshots + 3k@256 finish; the ranker picks the curve's best.
#   2. sr-x2 / sr-x4  — 50k mixed (MIX_RICH=0.5, smooth share 0.10) then a
#      12k smooth-0.25 low-LR top-up each (the r4g recipe: 50k alone got
#      smooth 24->38.4 dB, short of the ~44 dB nearest-parity gate).
#   3. diffusion finish / small mixed — as in r4f.
#
# Each phase snapshots its result npz under the staging dir so the ranker /
# validator can compare states; markers land in $LOGDIR for the promotion loop.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4j}
mkdir -p "$LOGDIR"
STAGE=$PWD/.staging_weights          # sr-x2, sr-x4, diffusion, small
FLAG_STAGE=$PWD/.staging_flagship    # conservative flagship probe
DECONV_STAGE=$PWD/.staging_deconv    # ambitious chunked flagship
mkdir -p "$STAGE" "$FLAG_STAGE" "$DECONV_STAGE"
for f in weights/*.npz; do
  [ -e "$STAGE/$(basename "$f")" ] || cp "$f" "$STAGE/"
done
cp weights/restore-unet.npz "$FLAG_STAGE/restore-unet.npz"
cp weights/restore-unet.npz "$DECONV_STAGE/restore-unet.npz"
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
  if [ "$remain" -le 300 ]; then
    echo "cutoff: skipping $log" >> "$LOGDIR/health.log"
    return 1
  fi
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
    if grep -q "interim export" "$LOGDIR/$log.try$attempt.log"; then
      echo "partial $log (interim export survived)" >> "$LOGDIR/health.log"
      touch "$LOGDIR/PHASE_${log}_DONE"
      return 0
    fi
    attempt=$((attempt + 1))
    sleep 120
  done
  echo "failed $log" >> "$LOGDIR/health.log"
  return 1
}

# 0. conservative flagship candidate first (~4 min): a safe promotable win
#    even if the tunnel dies right after
run_phase flagship_probe "$FLAG_STAGE" TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
  TRAIN_DATA_MIX_RICH=0.25 TRAIN_STEPS=1500 TRAIN_BATCH=8 TRAIN_SIZE=96 \
  TRAIN_LR=4e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=500

# 1. ambitious flagship: corrected-physics deconv chunks, mild interleave
#    baked in (r4i lesson), snapshot per 10k
for chunk in 1 2 3 4; do
  run_phase deconv_chunk$chunk "$DECONV_STAGE" TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_MILD=0.3 TRAIN_DATA_MIX_RICH=0.2 \
    TRAIN_STEPS=10000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
    TRAIN_LR=4e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=$((100 + chunk)) \
    && cp "$DECONV_STAGE/restore-unet.npz" "$DECONV_STAGE/restore-unet.chunk$chunk.npz"
  sleep 30
done
run_phase deconv_finish256 "$DECONV_STAGE" TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
  TRAIN_DATA_MIX_MILD=0.3 TRAIN_DATA_MIX_RICH=0.2 \
  TRAIN_STEPS=3000 TRAIN_BATCH=8 TRAIN_SIZE=256 \
  TRAIN_LR=1.5e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=222 \
  && cp "$DECONV_STAGE/restore-unet.npz" "$DECONV_STAGE/restore-unet.finish256.npz"
sleep 30

# 2. SR families: 50k mixed, snapshot, then the smooth-0.25 low-LR top-up
run_phase srx2 "$STAGE" TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_SMOOTH=1 TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=12500 \
  && cp "$STAGE/sr-x2.npz" "$STAGE/sr-x2.mixed50k.npz"
sleep 30
run_phase srx2_smooth25 "$STAGE" TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.25 \
  TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=12000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=3e-5 TRAIN_SEED=301 TRAIN_EXPORT_EVERY=4000 \
  && cp "$STAGE/sr-x2.npz" "$STAGE/sr-x2.smooth25.npz"
sleep 30
run_phase srx4 "$STAGE" TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_SMOOTH=1 TRAIN_DATA_MIX_RICH=0.5 TRAIN_STEPS=50000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=1e-4 TRAIN_EXPORT_EVERY=12500 \
  && cp "$STAGE/sr-x4.npz" "$STAGE/sr-x4.mixed50k.npz"
sleep 30
run_phase srx4_smooth25 "$STAGE" TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.25 \
  TRAIN_DATA_MIX_RICH=0.35 TRAIN_STEPS=12000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=3e-5 TRAIN_SEED=302 TRAIN_EXPORT_EVERY=4000 \
  && cp "$STAGE/sr-x4.npz" "$STAGE/sr-x4.smooth25.npz"
sleep 30

# 3. diffusion photo finish + small mixed
run_phase diffusion "$STAGE" TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_MIX_RICH=0.35 \
  TRAIN_STEPS=25000 TRAIN_BATCH=8 TRAIN_SIZE=128 TRAIN_LR=5e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=6000
sleep 30
run_phase small "$STAGE" TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
  TRAIN_DATA_MIX_MILD=0.3 TRAIN_DATA_MIX_RICH=0.3 TRAIN_STEPS=30000 TRAIN_BATCH=32 \
  TRAIN_SIZE=128 TRAIN_LR=8e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=10000

echo DONE > "$LOGDIR/ALL_DONE"
