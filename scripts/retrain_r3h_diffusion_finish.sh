#!/bin/bash
# Round-3 phase H: finish the diffusion schedule. The phase-E run hung on a
# tunnel RPC at step ~26k/50k (killed; interim export at 25k steps is the
# current npz, mid-cosine). Resume for the remaining budget so the weights
# ship annealed, with a post-train eval.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/retrain_r3h}
mkdir -p "$LOGDIR"

while [ ! -f /tmp/retrain_r3g/ALL_DONE ]; do sleep 60; done
sleep 150

TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_DATA_PHOTO=1 \
  TRAIN_DATA_MIX_RICH=0.35 \
  TRAIN_STEPS=25000 TRAIN_BATCH=8 TRAIN_SIZE=128 TRAIN_LR=5e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=12500 \
  python -m image_restoration_platform_tpu.train > "$LOGDIR/diffusion.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
