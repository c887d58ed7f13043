#!/bin/bash
# Round-3 phase D: flagship texture top-up. The periodic-texture clean
# family (train/data.py _periodic_texture) landed AFTER the flagship's
# phase-C 60k run, so only the 4k 256px polish saw it; the flagship still
# smooths dense texture away (-5.7 dB on jpeg'd halftones in the OOD eval).
# Waits for the phase-C sequence to finish, then fine-tunes the flagship on
# the texture-included distribution.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3d}
mkdir -p "$LOGDIR"

while [ ! -f /tmp/retrain_r3c/ALL_DONE ]; do sleep 60; done
sleep 150

TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=25000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_tex128.log" 2>&1
sleep 150
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=4000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=2e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_tex256.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
