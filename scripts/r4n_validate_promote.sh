#!/bin/bash
# Round-4 phase N: re-validate the two rebalance candidates under the
# corrected promotion metric (multi-seed mean per-image gain over damage
# rows; see scripts/eval_quality.py) and promote on PROMOTE.
#
# Background: the r4k/r4l HOLDs on the in-distribution photo axis were a
# measurement artifact of the old single-batch aggregate metric — one hard
# image dominated the mse-weighted aggregate and identity rows counted as
# "gain". Under the corrected metric the flagship rebalance candidate beats
# shipped on BOTH axes (rich 9.90 vs 7.40, photo 5.94 vs 5.41 at n=48).
# CPU-only (nice 19); safe alongside chip-side training.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4n}
mkdir -p "$LOGDIR"
NICE="nice -n 19"
PROM=$PWD/.staging_promote

validate_and_promote() {
  local fam="$1" cand="$2" tag="$3"
  [ -e "$cand" ] || { echo "missing $cand" >> "$LOGDIR/health.log"; return 1; }
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

validate_and_promote diffusion-restore .staging_diffrebal/diffusion-restore.npz diffusion_rebal
validate_and_promote restore-unet .staging_rebal/restore-unet.npz flagship_rebal

echo DONE > "$LOGDIR/ALL_DONE"
