#!/bin/bash
# Round-2 retraining on the rich natural-statistics distribution (train/data.py).
# Sequential: ONE TPU client at a time.
set -x
cd /root/repo
mkdir -p /tmp/retrain_logs

# flagship: warm start from round-1 weights, 128px then 256px fine-tune
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=3000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_logs/unet_128.log 2>&1
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=800 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=4e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_logs/unet_256.log 2>&1

TRAIN_FAMILY=restore-unet-small TRAIN_RESUME=1 TRAIN_STEPS=2000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_logs/small.log 2>&1

TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_STEPS=2000 TRAIN_BATCH=16 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_logs/srx2.log 2>&1
TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_STEPS=2000 TRAIN_BATCH=16 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_logs/srx4.log 2>&1

echo DONE > /tmp/retrain_logs/ALL_DONE
