#!/bin/bash
# Round-4 phase I: mild-photo rebalance of the best deconv flagship candidate.
# Every deconv candidate improved rich/OOD/real metrics but regressed the
# mild-photo held-out ~1.5 dB (validator HOLD axis); this tops up the ranked
# winner with the TRAIN_DATA_MIX_MILD interleave (40% mild / 20% rich / 40%
# deconv) at a low LR so the deblur/dejpeg capability keeps training while
# mild-damage coverage recovers.
#
# Usage: CUTOFF_EPOCH=... bash scripts/r4i_rebalance.sh <winner.npz>
set -x
cd "$(dirname "$0")/.."
WINNER=${1:?path to the ranked winner npz}
LOGDIR=${LOGDIR:-/tmp/r4i}
mkdir -p "$LOGDIR"
STAGE=$PWD/.staging_rebal
mkdir -p "$STAGE"
cp "$WINNER" "$STAGE/restore-unet.npz"
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch) for the train watchdog}

probe() {
  timeout 420 python - <<'EOF' > /dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

# ONE TPU client at a time: wait for the SR top-up queue to release the chip
while [ ! -e /tmp/r4g/ALL_DONE ]; do sleep 60; done
until probe; do
  echo "chip unavailable at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
  sleep 180
done

now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
if [ "$remain" -gt 300 ]; then
  timeout "$remain" env IRP_WEIGHTS_DIR="$STAGE" \
    TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_MILD=0.4 TRAIN_DATA_MIX_RICH=0.2 \
    TRAIN_STEPS=8000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
    TRAIN_LR=2.5e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=411 \
    TRAIN_EXPORT_EVERY=2000 \
    python -m image_restoration_platform_tpu.train > "$LOGDIR/rebalance.log" 2>&1
  grep -q "training done" "$LOGDIR/rebalance.log" && echo "done rebalance" >> "$LOGDIR/health.log"
fi
echo DONE > "$LOGDIR/ALL_DONE"
