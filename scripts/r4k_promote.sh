#!/bin/bash
# Round-4 phase K: promotion pipeline, chained behind the r4j retrain queue.
#
# Every CPU-side job here runs at nice -19: the phase-J lesson is that an
# un-niced validator starves the trainer's host path on this 1-core box (the
# chunk-1 warm-start sat idle for 10+ minutes until the validator was niced).
#
# Flow:
#   1. When the flagship deconv phases finish (finish256 marker, or queue
#      ALL_DONE as the fallback), rank every .staging_deconv snapshot plus
#      the shipped floor (reduced-n dual-corpus composite, rank_candidates.py
#      — gains minus strongly-weighted clean-harm, including in-distribution
#      held-out so the validator's HOLD axis is visible to the ranker).
#   2. Assemble .staging_promote: the ranker winner for the flagship (no
#      flagship promotion if the shipped floor wins), plus each family npz
#      from .staging_weights once the queue is done.
#   3. One full validate_staging.py run over the assembled dir -> per-family
#      PROMOTE/HOLD verdicts (pytest gates green AND no >0.5 regression on
#      any measured axis vs shipped).
#   4. For sr families that HOLD on the smooth-top-up endpoint, retry with
#      the mixed50k snapshot (the top-up trades in-distribution for smooth
#      anti-hallucination; the snapshot may sit better on the tolerance).
#   5. Copy each PROMOTE family's npz into weights/ and leave markers under
#      /tmp/r4k for the session to inspect, gate-check, and commit.
set -x
cd "$(dirname "$0")/.."
LOG=${LOGDIR:-/tmp/r4k}
mkdir -p "$LOG"
PROM=$PWD/.staging_promote
mkdir -p "$PROM"
# Seed with every shipped family so the gate pytest run (IRP_WEIGHTS_DIR=$PROM)
# never hits a missing npz: candidates overwrite their seed below, families
# whose retrain phase didn't complete validate as shipped-vs-shipped no-ops,
# and a "shipped floor wins" flagship verdict leaves the seed in place.
for f in weights/*.npz; do cp "$f" "$PROM/"; done
NICE="nice -n 19"

wait_marker() {
  while [ ! -e "$1" ] && [ ! -e /tmp/r4j/ALL_DONE ]; do sleep 60; done
}

# ---- 1. flagship ranking --------------------------------------------------
wait_marker /tmp/r4j/PHASE_deconv_finish256_DONE
$NICE python scripts/rank_candidates.py --dir .staging_deconv --n 8 \
  --include-shipped > "$LOG/rank.json" 2> "$LOG/rank.log"

WINNER=$($NICE python - "$LOG/rank.json" <<'EOF'
import json, sys
rows = json.load(open(sys.argv[1]))
print(rows[0]["candidate"] if rows else "__shipped__")
EOF
)
echo "flagship ranker winner: $WINNER" >> "$LOG/rank.log"
if [ "$WINNER" != "__shipped__" ] && [ -n "$WINNER" ]; then
  cp ".staging_deconv/$WINNER" "$PROM/restore-unet.npz"
  echo "$WINNER" > "$LOG/flagship_winner"
fi

# ---- 2. assemble the rest of the family set once the queue drains ---------
while [ ! -e /tmp/r4j/ALL_DONE ]; do sleep 60; done
for fam in sr-x2 sr-x4 diffusion-restore restore-unet-small; do
  # only stage families whose retrain phase actually completed (the seeded
  # copies in .staging_weights are byte-identical to shipped otherwise)
  case $fam in
    sr-x2) m=PHASE_srx2_smooth25_DONE ;;
    sr-x4) m=PHASE_srx4_smooth25_DONE ;;
    diffusion-restore) m=PHASE_diffusion_DONE ;;
    restore-unet-small) m=PHASE_small_DONE ;;
  esac
  if [ -e "/tmp/r4j/$m" ]; then
    cp ".staging_weights/$fam.npz" "$PROM/$fam.npz"
  fi
done

# ---- 3. full promotion validation over the assembled set ------------------
$NICE python scripts/validate_staging.py --stage .staging_promote \
  > "$LOG/verdicts.jsonl" 2> "$LOG/validate.log"

# ---- 4. sr HOLD retry with the pre-top-up snapshot -------------------------
RETRY=""
for fam in sr-x2 sr-x4; do
  if grep -q "\"family\": \"$fam\", \"verdict\": \"HOLD\"" "$LOG/verdicts.jsonl" \
     && [ -e ".staging_weights/$fam.mixed50k.npz" ]; then
    cp ".staging_weights/$fam.mixed50k.npz" "$PROM/$fam.npz"
    RETRY="$RETRY --family $fam"
  fi
done
if [ -n "$RETRY" ]; then
  $NICE python scripts/validate_staging.py --stage .staging_promote $RETRY \
    > "$LOG/verdicts_retry.jsonl" 2> "$LOG/validate_retry.log"
fi

# ---- 5. promote PROMOTE verdicts into weights/ -----------------------------
$NICE python - "$LOG" "$PROM" <<'EOF'
import json, os, shutil, sys
log, prom = sys.argv[1], sys.argv[2]
verdicts = {}
for name in ("verdicts.jsonl", "verdicts_retry.jsonl"):
    path = os.path.join(log, name)
    if os.path.exists(path):
        for line in open(path):
            line = line.strip()
            if line:
                row = json.loads(line)
                verdicts[row["family"]] = row  # retry overrides
promoted = []
for fam, row in verdicts.items():
    if row["verdict"] == "PROMOTE":
        shutil.copy(os.path.join(prom, f"{fam}.npz"), os.path.join("weights", f"{fam}.npz"))
        promoted.append(fam)
with open(os.path.join(log, "PROMOTED"), "w") as fh:
    fh.write(json.dumps({"promoted": promoted, "verdicts": verdicts}, indent=2))
EOF

echo DONE > "$LOG/ALL_DONE"
