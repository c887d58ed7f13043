#!/bin/bash
# Round-3 phase G: mixed-distribution top-ups for the restore families.
# Phase C/D trained them on photo+texture only; the rich held-out dropped
# (small +12.4 -> +4.6 dB). A 50/35% rich interleave recovers rich-content
# behavior while keeping the photo/texture robustness.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3g}
mkdir -p "$LOGDIR"

while [ ! -f /tmp/retrain_r3f2/ALL_DONE ]; do sleep 60; done
sleep 150

TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.5 \
  TRAIN_STEPS=30000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/small_mix.log" 2>&1
sleep 150

TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.35 \
  TRAIN_STEPS=30000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=5e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=15000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_mix128.log" 2>&1
sleep 150
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.35 \
  TRAIN_STEPS=3000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=1.5e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_mix256.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
