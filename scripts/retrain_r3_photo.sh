#!/bin/bash
# Round-3 OOD-robustness fine-tune: photographic-physics data distribution
# (train/data.py photo=True — flat/saturated content families, PSF blur,
# signal-dependent noise, DCT quantization, vignette). Warm-starts every
# family from the shipped round-2 weights. Driven by the OOD gap measured in
# scripts/eval_ood.py (round-2 model at -10 dB on defocus/jpeg classes).
# The sleeps between phases let the TPU client release cleanly.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3}
mkdir -p "$LOGDIR"

# flagship: the OOD gate family
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=80000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_photo128.log" 2>&1
sleep 150
# 256px polish at low LR (serving buckets are 256/512)
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=4000 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=2e-5 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/unet_photo256.log" 2>&1
echo DONE > "$LOGDIR/FLAGSHIP_DONE"
sleep 150

# the small family (same serving contract)
TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/small_photo128.log" 2>&1
sleep 150

# SR families: photo distribution improves content generalization
TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx2_photo.log" 2>&1
sleep 150
TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=20000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx4_photo.log" 2>&1
sleep 150

# diffusion: sampler-aware at the 2-step serving default
TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=30000 TRAIN_BATCH=16 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=15000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/diffusion_photo.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
