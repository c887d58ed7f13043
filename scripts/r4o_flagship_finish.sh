#!/bin/bash
# Round-4 phase O: flagship finish. Replaces r4m (killed before start).
#
# Context: under the corrected promotion metric the r4l rebalance candidate
# beats shipped on rich (+2.5), photo (+0.5), vignette (+3.3) and halves the
# real-corpus worst clean harm, but HOLDs on exactly one axis —
# ood/clean_worst_mad 9.64 -> 10.26 /255 (tolerance 0.5). This continues
# from the rebalanced weights with identity-heavy mild-photo chunks, then
# picks the best snapshot that clears BOTH the photo floor AND the
# ood-clean-worst floor before the full promotion validate.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4o}
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
    TRAIN_LR=2e-5 TRAIN_IDENTITY_WEIGHT=6.0 TRAIN_SEED=42$chunk \
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
# both validator axes the rebalance HOLDs could trip on: the in-distribution
# photo floor and the ood-corpus worst-image clean harm (clean_worst is
# reported as a positive mad in rank detail; validator floor = shipped+tol)
photo_floor = (shipped["detail"].get("indist/photo", 0.0) - 0.5) if shipped else 0.0
worst_cap = (shipped["detail"].get("ood/clean_worst", 99.0) + 0.5) if shipped else 99.0
for r in rows:
    if r["candidate"] == "__shipped__" or r["candidate"] == "restore-unet.npz":
        continue
    d = r["detail"]
    if (d.get("indist/photo", -99.0) >= photo_floor
            and d.get("ood/clean_worst", 99.0) <= worst_cap):
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
