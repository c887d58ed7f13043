#!/bin/bash
set -x
cd /root/repo
mkdir -p /tmp/retrain3_logs
# flagship + small, trained THROUGH the serving shrinkage on the balanced generator
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=2500 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=6e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain3_logs/unet128.log 2>&1
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=600 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=3e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain3_logs/unet256.log 2>&1
TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_STEPS=1500 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=6e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain3_logs/small.log 2>&1
echo DONE > /tmp/retrain3_logs/ALL_DONE
