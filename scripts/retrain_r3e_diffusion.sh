#!/bin/bash
# Round-3 phase E: diffusion retrain retry. The phase-C diffusion run OOM'd
# at AOT compile (16.46G > 15.75G HBM) with TRAIN_BATCH=16 x the 2-step
# unrolled sampler on the texture-included data program; halve the batch and
# double-ish the steps to keep the sample budget.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3e}
mkdir -p "$LOGDIR"

while [ ! -f /tmp/retrain_r3d/ALL_DONE ]; do sleep 60; done
sleep 150

TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_STEPS=50000 TRAIN_BATCH=8 TRAIN_SIZE=128 TRAIN_LR=8e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=25000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/diffusion.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
