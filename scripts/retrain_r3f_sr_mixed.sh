#!/bin/bash
# Round-3 phase F: SR families on the 50/50 mixed distribution. The pure
# photo+texture retrain (phase C) taught SRNet to hallucinate texture into
# smooth gradients (-5 dB vs nearest on the rich held-out, red sr-x2 gate);
# interleaving rich batches restores smooth-content behavior while keeping
# the texture detail gains (trainer data_mix_rich).
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3f2}
mkdir -p "$LOGDIR"

while [ ! -f /tmp/retrain_r3e/ALL_DONE ]; do sleep 60; done
sleep 150

TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.5 \
  TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=25000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx2.log" 2>&1
sleep 150
TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 TRAIN_DATA_MIX_RICH=0.5 \
  TRAIN_STEPS=50000 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  TRAIN_EXPORT_EVERY=25000 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/srx4.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
