#!/bin/bash
# Round-3 phase B: continue the photo-distribution fine-tune AFTER the
# exposure/contrast/saturation clean augmentation landed in train/data.py
# (the phase-A flagship still brightened clean dark OOD images by +80/255 —
# dark/flat/muted content must appear in training with identity targets).
# Flagship first (the OOD gate family), then the other families.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3b}
mkdir -p "$LOGDIR"

TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=60000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_aug128.log" 2>&1
sleep 150
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=4000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=2e-5 \
  TRAIN_IDENTITY_WEIGHT=4.0 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_aug256.log" 2>&1
echo DONE > "$LOGDIR/FLAGSHIP_DONE"
sleep 150

TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/small_aug128.log" 2>&1
echo DONE > "$LOGDIR/SMALL_DONE"
sleep 150

TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx2_aug.log" 2>&1
sleep 150
TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx4_aug.log" 2>&1
echo DONE > "$LOGDIR/SR_DONE"
sleep 150

TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=30000 TRAIN_BATCH=16 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=15000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/diffusion_aug.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
