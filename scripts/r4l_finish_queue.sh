#!/bin/bash
# Round-4 phase L: the post-promotion finish queue. Everything chip-side,
# gated behind a STRONG tunnel-health probe (the 12:05 UTC degradation made
# D2H stall ~200 s/fetch while H2D stayed at 1.2 GB/s — the r4h measurement
# session that ran through it produced garbage and must be re-recorded).
#
# Phases (each re-probes health, respects CUTOFF_EPOCH):
#   1. flagship photo-rebalance from the ranked deconv winner (probe1500):
#      the r4k validator HOLDs it on the in-distribution photo axis alone
#      (5.93 -> 3.08) while every other axis improved; the r4i mild-photo
#      interleave recipe recovers photo coverage at low LR.
#   2. rank rebalance snapshots, pick the best composite WITH photo within
#      tolerance of shipped, validate, promote on PROMOTE.
#   3. diffusion photo-finish (same HOLD shape: photo 6.26 -> 2.62).
#   4. sr-x2/sr-x4 photo top-ups (HOLD on photo/degraded).
#   5. clean measurement re-record: segments with SERVE_DEBLUR A/B,
#      sr_tiled wall, profile + hlo_stats (parse_xplane protobuf fixed).
#   6. bench.py headline on chip -> docs/measurements/r4/bench_r4l.json.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4l}
OUT=docs/measurements/r4
mkdir -p "$LOGDIR" "$OUT"
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch)}

probe() {
  # strong health: fresh-buffer D2H of 12 MB must complete < 5 s (the sick
  # tunnel passes a scalar-sum probe eventually but stalls bulk D2H ~200 s)
  timeout 180 python - <<'EOF' > /dev/null 2>&1
import time
import jax, jax.numpy as jnp
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
    echo "chip/tunnel unhealthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
    sleep 180
    local now=$(date +%s)
    [ $((CUTOFF_EPOCH - now)) -le 600 ] && return 1
  done
  echo "healthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
  return 0
}

run_phase() {
  local log="$1" wdir="$2"; shift 2
  local now remain attempt=1
  now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
  if [ "$remain" -le 300 ]; then
    echo "cutoff: skipping $log" >> "$LOGDIR/health.log"
    return 1
  fi
  while [ "$attempt" -le 2 ]; do
    wait_chip || return 1
    now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
    [ "$remain" -le 300 ] && return 1
    timeout "$remain" env IRP_WEIGHTS_DIR="$wdir" "$@" \
      python -m image_restoration_platform_tpu.train > "$LOGDIR/$log.try$attempt.log" 2>&1
    if grep -q "training done" "$LOGDIR/$log.try$attempt.log"; then
      cp "$LOGDIR/$log.try$attempt.log" "$LOGDIR/$log.log"
      touch "$LOGDIR/PHASE_${log}_DONE"
      return 0
    fi
    if grep -q "interim export" "$LOGDIR/$log.try$attempt.log"; then
      touch "$LOGDIR/PHASE_${log}_DONE"
      return 0
    fi
    attempt=$((attempt + 1))
    sleep 120
  done
  echo "failed $log" >> "$LOGDIR/health.log"
  return 1
}

NICE="nice -n 19"

validate_and_promote() {
  # $1 = family, $2 = candidate npz path, $3 = tag for logs
  local fam="$1" cand="$2" tag="$3"
  local PROM=$PWD/.staging_promote
  cp "$cand" "$PROM/$fam.npz"
  $NICE python scripts/validate_staging.py --stage "$PROM" --family "$fam" \
    > "$LOGDIR/verdict_$tag.jsonl" 2> "$LOGDIR/validate_$tag.log"
  if grep -q '"verdict": "PROMOTE"' "$LOGDIR/verdict_$tag.jsonl"; then
    cp "$PROM/$fam.npz" "weights/$fam.npz"
    echo "PROMOTED $fam ($tag)" >> "$LOGDIR/health.log"
    touch "$LOGDIR/PROMOTED_$tag"
  else
    echo "HOLD $fam ($tag)" >> "$LOGDIR/health.log"
  fi
}

# ---- 1. flagship photo-rebalance -------------------------------------------
REBAL=$PWD/.staging_rebal
mkdir -p "$REBAL"
cp .staging_deconv/restore-unet.probe1500.npz "$REBAL/restore-unet.npz"
run_phase rebal "$REBAL" TRAIN_FAMILY=restore-unet TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_DECONV=1 TRAIN_DATA_GRAIN=1 TRAIN_DATA_SMOOTH=1 \
  TRAIN_DATA_MIX_MILD=0.4 TRAIN_DATA_MIX_RICH=0.2 \
  TRAIN_STEPS=8000 TRAIN_BATCH=32 TRAIN_SIZE=128 \
  TRAIN_LR=2.5e-5 TRAIN_IDENTITY_WEIGHT=4.0 TRAIN_SEED=411 \
  TRAIN_EXPORT_EVERY=2000

# ---- 2. rank snapshots + photo-aware pick + validate + promote -------------
if [ -e "$LOGDIR/PHASE_rebal_DONE" ]; then
  $NICE python scripts/rank_candidates.py --dir "$REBAL" --n 8 --include-shipped \
    > "$LOGDIR/rebal_rank.json" 2> "$LOGDIR/rebal_rank.log"
  WINNER=$($NICE python - "$LOGDIR/rebal_rank.json" <<'EOF'
import json, sys
rows = json.load(open(sys.argv[1]))
# highest composite whose in-distribution photo gain stays within the
# validator's tolerance of the shipped floor (the r4k HOLD axis)
shipped = next((r for r in rows if r["candidate"] == "__shipped__"), None)
floor = (shipped["detail"].get("indist/photo", 0.0) - 0.5) if shipped else 0.0
for r in rows:
    if r["candidate"] == "__shipped__":
        continue
    if r["detail"].get("indist/photo", -99.0) >= floor:
        print(r["candidate"])
        break
EOF
)
  if [ -n "$WINNER" ]; then
    validate_and_promote restore-unet "$REBAL/$WINNER" flagship_rebal
  fi
fi

# ---- 3. diffusion photo-finish ----------------------------------------------
DIFF=$PWD/.staging_diffrebal
mkdir -p "$DIFF"
cp .staging_weights/diffusion-restore.npz "$DIFF/diffusion-restore.npz"
run_phase diffrebal "$DIFF" TRAIN_FAMILY=diffusion-restore TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_MIX_MILD=0.4 \
  TRAIN_DATA_MIX_RICH=0.15 TRAIN_STEPS=6000 TRAIN_BATCH=8 TRAIN_SIZE=128 \
  TRAIN_LR=3e-5 TRAIN_DIFFUSION_SAMPLER_STEPS=2 TRAIN_EXPORT_EVERY=2000 \
  TRAIN_SEED=412 \
  && validate_and_promote diffusion-restore "$DIFF/diffusion-restore.npz" diffusion_rebal

# ---- 4. sr photo top-ups ----------------------------------------------------
SRR=$PWD/.staging_srrebal
mkdir -p "$SRR"
cp .staging_weights/sr-x2.npz "$SRR/sr-x2.npz"
run_phase srx2rebal "$SRR" TRAIN_FAMILY=sr-x2 TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.1 \
  TRAIN_DATA_MIX_MILD=0.4 TRAIN_DATA_MIX_RICH=0.3 TRAIN_STEPS=10000 \
  TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=2e-5 TRAIN_SEED=413 \
  TRAIN_EXPORT_EVERY=2500 \
  && validate_and_promote sr-x2 "$SRR/sr-x2.npz" srx2_rebal
cp .staging_weights/sr-x4.npz "$SRR/sr-x4.npz"
run_phase srx4rebal "$SRR" TRAIN_FAMILY=sr-x4 TRAIN_RESUME=1 \
  TRAIN_DATA_PHOTO=1 TRAIN_DATA_SMOOTH=1 TRAIN_DATA_SMOOTH_SHARE=0.1 \
  TRAIN_DATA_MIX_MILD=0.4 TRAIN_DATA_MIX_RICH=0.3 TRAIN_STEPS=10000 \
  TRAIN_BATCH=32 TRAIN_SIZE=128 TRAIN_LR=2e-5 TRAIN_SEED=414 \
  TRAIN_EXPORT_EVERY=2500 \
  && validate_and_promote sr-x4 "$SRR/sr-x4.npz" srx4_rebal

# ---- 5. clean measurement re-record ----------------------------------------
wait_chip && {
  SERVE_DEBLUR=1 timeout 2400 python scripts/measure_segments.py \
    > "$OUT/segments_deblur1.log" 2>&1
  SERVE_DEBLUR=0 timeout 2400 python scripts/measure_segments.py \
    > "$OUT/segments_deblur0.log" 2>&1
  timeout 1800 python scripts/measure_sr_tiled_wall.py > "$OUT/sr_tiled_wall.log" 2>&1
  timeout 1800 python scripts/profile_restore.py > "$OUT/profile.log" 2>&1
  timeout 900 python scripts/parse_xplane.py /tmp/irp_prof hlo_stats \
    > "$OUT/hlo_stats.log" 2>&1
}

# ---- 6. bench headline -------------------------------------------------------
wait_chip && timeout 3000 python bench.py > "$OUT/bench_r4l.log" 2>&1

echo DONE > "$LOGDIR/ALL_DONE"
