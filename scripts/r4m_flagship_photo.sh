#!/bin/bash
# Round-4 phase M: iterative flagship photo-axis recovery, chained behind
# the r4l finish queue. The r4l rebalance (MIX_MILD=0.4) recovered the
# validator's HOLD axis from 3.08 to 4.63 dB but the no-regression floor is
# 5.43 (shipped 5.93 - 0.5 tolerance); this continues from the rebalanced
# weights with a heavier mild-photo share in snapshot-per-chunk form, then
# ranks all snapshots and promotes the best composite whose photo axis
# clears the floor.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4m}
mkdir -p "$LOGDIR"
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch)}
NICE="nice -n 19"

probe() {
  timeout 180 python - <<'EOF' > /dev/null 2>&1
import time
import jax
import numpy as np
assert jax.devices()[0].platform != "cpu"
a = np.random.default_rng(int(time.time()) % 2**31).integers(
    0, 255, (1024, 1024, 12), dtype=np.uint8)
d = jax.device_put(a); d.block_until_ready()
t0 = time.perf_counter()
np.asarray(d)
assert time.perf_counter() - t0 < 5.0
EOF
}

wait_chip() {
  until probe; do
    echo "unhealthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
    sleep 180
    [ $(($(date +%s))) -ge $((CUTOFF_EPOCH - 600)) ] && return 1
  done
  return 0
}

while [ ! -e /tmp/r4l/ALL_DONE ]; do sleep 60; done

STAGE=$PWD/.staging_photorec
mkdir -p "$STAGE"
cp .staging_rebal/restore-unet.npz "$STAGE/restore-unet.npz"
cp .staging_rebal/restore-unet.npz "$STAGE/restore-unet.chunk0.npz"

for chunk in 1 2 3; do
  now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
  [ "$remain" -le 600 ] && break
  wait_chip || break
  timeout "$remain" env IRP_WEIGHTS_DIR="$STAGE" \
    TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
    TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
    TRAIN_DATA_MIX_MILD=0.55 TRAIN_DATA_MIX_RICH=0.2 \
    TRAIN_STEPS=4000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
    TRAIN_LR=2e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=42$chunk \
    python -m image_restoration_platform_tpu.train \
    > "$LOGDIR/chunk$chunk.log" 2>&1
  grep -q "training done" "$LOGDIR/chunk$chunk.log" || break
  cp "$STAGE/restore-unet.npz" "$STAGE/restore-unet.chunk$chunk.npz"
done

$NICE python scripts/rank_candidates.py --dir "$STAGE" --n 8 --include-shipped \
  > "$LOGDIR/rank.json" 2> "$LOGDIR/rank.log"

WINNER=$($NICE python - "$LOGDIR/rank.json" <<'EOF'
import json, sys
rows = json.load(open(sys.argv[1]))
shipped = next((r for r in rows if r["candidate"] == "__shipped__"), None)
floor = (shipped["detail"].get("indist/photo", 0.0) - 0.5) if shipped else 0.0
for r in rows:
    if r["candidate"] == "__shipped__" or r["candidate"] == "restore-unet.npz":
        continue
    if r["detail"].get("indist/photo", -99.0) >= floor:
        print(r["candidate"])
        break
EOF
)
if [ -n "$WINNER" ]; then
  PROM=$PWD/.staging_promote
  cp "$STAGE/$WINNER" "$PROM/restore-unet.npz"
  $NICE python scripts/validate_staging.py --stage "$PROM" --family restore-unet \
    > "$LOGDIR/verdict.jsonl" 2> "$LOGDIR/validate.log"
  if grep -q '"verdict": "PROMOTE"' "$LOGDIR/verdict.jsonl"; then
    cp "$PROM/restore-unet.npz" weights/restore-unet.npz
    echo "PROMOTED flagship ($WINNER)" >> "$LOGDIR/health.log"
    touch "$LOGDIR/PROMOTED"
  fi
fi
echo DONE > "$LOGDIR/ALL_DONE"
