#!/bin/bash
# Round-5 phase B: post-training measurement pass for the 2026-08-19 perf
# set (fold default OFF, deblur veto gated, s2d_io, yuv420 restore egress).
#
# Chains behind the r5a training queue (one TPU client at a time), re-probes
# tunnel health, then records:
#   1. measure_step_profiled.py — device-clock variant table (tunnel-immune).
#   2. bench.py               — the round headline with the shipping defaults.
#   3. loadtest.py            — e2e HTTP throughput with the yuv420 egress.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r5b}
mkdir -p "$LOGDIR"
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

wait_chip() {
  until probe; do
    echo "unhealthy at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
    sleep 180
    [ $(($(date +%s))) -ge $((CUTOFF_EPOCH - 600)) ] && return 1
  done
  return 0
}

remain() { echo $((CUTOFF_EPOCH - $(date +%s))); }

# chain behind r5a (don't contend for the chip with the trainer)
while [ ! -e /tmp/r5a/ALL_DONE ]; do
  sleep 120
  [ "$(remain)" -le 3600 ] && break   # salvage measurement time near cutoff
done

# 1. device-clock variant table: runs even when the tunnel is degraded
#    (chip event clocks; only the warmup fetches are slow then)
if [ ! -e "$LOGDIR/profiled.done" ]; then
  timeout 5400 python scripts/measure_step_profiled.py > "$LOGDIR/profiled.log" 2>&1
  echo "rc=$?" >> "$LOGDIR/profiled.log"
  touch "$LOGDIR/profiled.done"
fi

# 2+3 need a healthy tunnel (host-timed)
if [ ! -e "$LOGDIR/bench.done" ] && [ "$(remain)" -gt 1200 ]; then
  wait_chip && timeout 2400 python bench.py > "$LOGDIR/bench.log" 2>&1
  echo "rc=$?" >> "$LOGDIR/bench.log"
  touch "$LOGDIR/bench.done"
fi

if [ ! -e "$LOGDIR/loadtest.done" ] && [ "$(remain)" -gt 1200 ]; then
  if wait_chip; then
    env SERVE_WARMUP=512 ADMIN_DEV_OPEN=1 ALLOW_DEGRADED=1 \
      python -m image_restoration_platform_tpu.api > "$LOGDIR/server.log" 2>&1 &
    SRV=$!
    up=0
    for _ in $(seq 1 150); do
      curl -fsS -o /dev/null localhost:8080/health/live 2>/dev/null && { up=1; break; }
      kill -0 $SRV 2>/dev/null || break
      sleep 5
    done
    if [ "$up" = "1" ]; then
      timeout 900 python scripts/loadtest.py http://localhost:8080 96 16 \
        > "$LOGDIR/loadtest.log" 2>&1
      echo "rc=$?" >> "$LOGDIR/loadtest.log"
    fi
    kill $SRV 2>/dev/null
    wait $SRV 2>/dev/null
  fi
  touch "$LOGDIR/loadtest.done"
fi

echo DONE > "$LOGDIR/ALL_DONE"
