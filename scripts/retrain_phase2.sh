#!/bin/bash
set -x
cd /root/repo
mkdir -p /tmp/retrain2_logs

# flagship with identity-weighted loss + near-clean band (no-harm gate)
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=2500 TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=6e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain2_logs/unet_noharm.log 2>&1
TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 TRAIN_STEPS=600 TRAIN_BATCH=8 TRAIN_SIZE=256 TRAIN_LR=3e-5 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain2_logs/unet_noharm256.log 2>&1

# diffusion: base denoising objective on rich data, then 2-step sampler-aware fine-tune
TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_STEPS=3000 TRAIN_BATCH=16 TRAIN_SIZE=128 TRAIN_LR=1e-4 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain2_logs/diff_base.log 2>&1
TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 TRAIN_STEPS=1200 TRAIN_BATCH=8 TRAIN_SIZE=128 TRAIN_LR=3e-5 \
  TRAIN_DIFFUSION_SAMPLER_STEPS=2 \
  python -m image_restoration_platform_tpu.train > /tmp/retrain2_logs/diff_2step.log 2>&1

echo DONE > /tmp/retrain2_logs/ALL_DONE
