#!/bin/bash
# Round-3 phase C: retrain on the CORRECTED creative-grade distribution
# (highlight-preserving grades, ambiguous degradations gated off graded
# cleans, shot-noise-coupled underexposure -- train/data.py). Phase B
# collapsed to +4.7 dB because its linear exposure aug was pixel-identical
# to the lowLight degradation; phase-A weights already measure +14.7 dB on
# the corrected distribution, so every family warm-starts from its current
# committed npz.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3c}
mkdir -p "$LOGDIR"

TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=60000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_128.log" 2>&1
sleep 150
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=4000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=2e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_256.log" 2>&1
echo DONE > "$LOGDIR/FLAGSHIP_DONE"
sleep 150

TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/small_128.log" 2>&1
echo DONE > "$LOGDIR/SMALL_DONE"
sleep 150

TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx2.log" 2>&1
sleep 150
TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx4.log" 2>&1
echo DONE > "$LOGDIR/SR_DONE"
sleep 150

TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=30000 TRAIN_BATCH=16 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=15000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/diffusion.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
