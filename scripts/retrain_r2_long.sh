#!/bin/bash
# Round-2 long fine-tune: push flagship quality on the rich natural-statistics
# distribution. Warm-starts from the shipped weights; exports npz per phase.
# The sleeps between phases let the TPU release cleanly — back-to-back client
# handoffs on this stack race and FailedPrecondition the second process.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/retrain_r2b
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=40000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2b/unet128b.log 2>&1
sleep 150
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=2500 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=2e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain_r2b/unet256b.log 2>&1
echo DONE > /tmp/retrain_r2b/ALL_DONE2
