#!/bin/bash
# Round-4 phase Q: final measurement re-record, chained behind r4p.
#
# Two tiers by tunnel-health requirement:
#   1. measure_step_profiled.py — module device time from jax.profiler
#      traces (chip event clocks): valid even on a degraded tunnel, runs
#      unconditionally. Gives the deblur-probe cost and fold gain for the
#      CURRENT code (incl. the top_k veto).
#   2. bench.py headline + loadtest — host-timed, only behind the strong
#      D2H probe.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4q}
OUT=docs/measurements/r4
mkdir -p "$LOGDIR" "$OUT"
CUTOFF_EPOCH=${CUTOFF_EPOCH:?set CUTOFF_EPOCH (unix epoch)}

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

# start when r4p is done (sentinel or both queue processes gone — r4p's
# early-exit paths skip the sentinel) OR 75 min before cutoff
alive_any() {
  for pidfile in /tmp/r4o.pid /tmp/r4p.pid; do
    [ -e "$pidfile" ] && ps -p "$(cat "$pidfile")" > /dev/null 2>&1 && return 0
  done
  return 1
}
while [ ! -e /tmp/r4p/ALL_DONE ] && alive_any; do
  sleep 60
  [ $(($(date +%s))) -ge $((CUTOFF_EPOCH - 4500)) ] && break
done
# if r4o/r4p are still alive they own the chip: wait for both to exit.
# NEVER run two TPU clients at once — if they are still alive at the
# deadline, give up on measurement rather than contend.
busy() {
  for pidfile in /tmp/r4o.pid /tmp/r4p.pid; do
    [ -e "$pidfile" ] && ps -p "$(cat "$pidfile")" > /dev/null 2>&1 && return 0
  done
  return 1
}
while busy; do
  sleep 60
  if [ $(($(date +%s))) -ge $((CUTOFF_EPOCH - 2400)) ]; then
    echo "train queues still own the chip; skipping" > "$LOGDIR/ALL_DONE"
    exit 0
  fi
done

now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
[ "$remain" -le 600 ] && { echo cutoff > "$LOGDIR/ALL_DONE"; exit 0; }

# tier 1: profiler-clock measurement (tunnel-degradation tolerant)
timeout $((remain > 2400 ? 2400 : remain)) python scripts/measure_step_profiled.py \
  > "$OUT/step_profiled.log" 2>&1

# tier 2: host-timed headline, only on a healthy tunnel
now=$(date +%s); remain=$((CUTOFF_EPOCH - now))
if [ "$remain" -gt 900 ] && probe; then
  timeout $((remain > 2700 ? 2700 : remain - 300)) python bench.py \
    > "$OUT/bench_r4q.json" 2> "$OUT/bench_r4q.log"
fi
echo DONE > "$LOGDIR/ALL_DONE"
