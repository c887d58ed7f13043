#!/bin/bash
# Round-4 phase H: device-side measurement session, queued behind the SR
# smooth top-ups (ONE TPU client at a time). Produces the evidence for the
# <2.0 ms/img push: ablated-segment timing of the fused serving step
# (scripts/measure_segments.py) plus an xplane per-HLO device-time table
# (scripts/profile_restore.py -> scripts/parse_xplane.py), all archived
# under docs/measurements/r4/.
set -x
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4h}
OUT=docs/measurements/r4
mkdir -p "$LOGDIR" "$OUT"

probe() {
  timeout 420 python - <<'EOF' > /dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

# chain behind whichever retrain queue is active (r4g historically; r4j after
# the second VM restart relaunch)
while [ ! -e /tmp/r4g/ALL_DONE ] && [ ! -e /tmp/r4j/ALL_DONE ]; do sleep 60; done

until probe; do
  echo "chip unavailable at $(date -u +%H:%M:%S)" >> "$LOGDIR/health.log"
  sleep 180
done

timeout 2400 python scripts/measure_segments.py > "$OUT/segments.log" 2>&1
timeout 1800 python scripts/measure_sr_tiled_wall.py > "$OUT/sr_tiled_wall.log" 2>&1
timeout 1800 python scripts/profile_restore.py > "$OUT/profile.log" 2>&1
timeout 900 python scripts/parse_xplane.py /tmp/irp_prof hlo_stats \
  > "$OUT/hlo_stats.log" 2>&1
echo DONE > "$LOGDIR/ALL_DONE"
