#!/bin/bash
# Identity-weighted polish for the flagship (restores the bounded-harm margin
# after the long fine-tune) + longer schedules for every other family.
# Inter-phase sleeps: back-to-back TPU client handoffs race on this stack.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/retrain_r2c
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=1200 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=8e-6 TRAIN_IDENTITY_WEIGHT=8 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2c/unet_polish.log 2>&1
sleep 150
TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_STEPS=20000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2c/small.log 2>&1
sleep 150
TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_STEPS=20000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2c/srx2.log 2>&1
sleep 150
TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_STEPS=20000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2c/srx4.log 2>&1
sleep 150
TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_STEPS=16000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=6e-5 TRAIN_DIFFUSION_SAMPLER_STEPS=2 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2c/diffusion.log 2>&1
echo DONE > /tmp/retrain_r2c/ALL_DONE
