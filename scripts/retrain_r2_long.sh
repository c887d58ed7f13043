#!/bin/bash
# Round-2 long fine-tune: push flagship quality on the rich natural-statistics
# distribution. Warm-starts from the shipped weights; exports npz on completion.
set -x
cd /root/repo
mkdir -p /tmp/retrain_r2b
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=6000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=5e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2b/unet128.log 2>&1
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=900 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=2e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2b/unet256.log 2>&1
echo DONE > /tmp/retrain_r2b/ALL_DONE
