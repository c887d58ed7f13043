#!/bin/bash
# Round-4 phase E: flagship deconv retrain on the CORRECTED blur physics.
#
# The round-4 ablation (docs/STATUS.md) showed the previous deconv retrain's
# entire "+4.5 dB deblur gain" was repair of the zero-pad SAME rim artifact
# (interior-only gain +0.04 dB): the model learned to brighten a dark frame,
# not to invert the PSF. _psf_blur now edge-replicates, removing the
# shortcut. This retrains the flagship from the SHIPPED r3 npz in 10k-step
# chunks, snapshotting the export after each chunk so every interim can be
# validated on CPU (the 40k single-shot run regressed the real-photo corpus;
# chunk snapshots let us pick the best point on that curve instead of the
# endpoint).
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4e}
mkdir -p "$LOGDIR"
STAGE=$PWD/.staging_deconv
mkdir -p "$STAGE"
cp weights/restore-unet.npz "$STAGE/restore-unet.npz"
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

# wait for the r4d queue to release the chip
while [ ! -e /tmp/r4d/ALL_DONE ]; do sleep 60; done

for chunk in 1 2 3 4; do
  now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
  [ "$remain" -le 300 ] && break
  wait_chip
  timeout "$remain" env IRP_WEIGHTS_DIR="$STAGE" \
    TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_RICH=0.25 TRAIN_STEPS=10000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
    TRAIN_LR=4e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=$((100 + chunk)) \
    python -m image_restoration_platform_tpu.train > "$LOGDIR/chunk$chunk.log" 2>&1
  if grep -q "training done" "$LOGDIR/chunk$chunk.log"; then
    cp "$STAGE/restore-unet.npz" "$STAGE/restore-unet.chunk$chunk.npz"
    echo "done chunk$chunk" >> "$LOGDIR/health.log"
  else
    echo "chunk$chunk died" >> "$LOGDIR/health.log"
    sleep 120
  fi
done
# 256px finish on whatever the last chunk left (validation picks the final
# promotion candidate among chunk snapshots + this finish)
now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
if [ "$remain" -gt 300 ]; then
  wait_chip
  timeout "$remain" env IRP_WEIGHTS_DIR="$STAGE" \
    TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_RICH=0.25 TRAIN_STEPS=3000 TRAIN_BATCH=8 TRAIN_SIZE=256 \
    TRAIN_LR=1.5e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=222 \
    python -m image_restoration_platform_tpu.train > "$LOGDIR/finish256.log" 2>&1
  grep -q "training done" "$LOGDIR/finish256.log" \
    && cp "$STAGE/restore-unet.npz" "$STAGE/restore-unet.finish256.npz"
fi
echo DONE > "$LOGDIR/ALL_DONE"
