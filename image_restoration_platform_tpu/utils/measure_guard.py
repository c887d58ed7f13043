"""Measurement-validity guard: pre/post fresh-buffer D2H probes + stamping.

Round-4 post-mortem (VERDICT r4 weak #2): three measurement sessions in one
round recorded garbage because the axon tunnel degraded mid-run — host-timed
chain-differencing silently absorbs a 0.1 MB/s D2H into "step time", and the
only reason the numbers were caught was a human noticing a 2270 ms step.
This module makes validity a property of the RECORD, enforced by the
harness: every host-timed measurement runs a D2H probe before and after its
timed section and carries a `validity` stamp; consumers
(scripts/rank_candidates.py, BASELINE.md updates) refuse unstamped or
INVALID host-timed records. Device-clock records (xplane event clocks,
scripts/parse_xplane.py) are exempt — they stamp DEVICE_CLOCK.

The probe runs IN-PROCESS, against the measurement's own JAX client: probing
from a second process while this one holds the chip wedges both (one TPU
client at a time on this stack — .claude/skills/verify). A stalled tunnel
therefore hangs the probe with the process; outer drivers (scripts/
chip_queue.py payload budgets, the round driver's bench timeout) bound that.

Thresholds mirror the tunnel taxonomy in scripts/chip_queue.py: healthy
means a fresh (never-fetched) 12 MB buffer comes back at >2.4 MB/s
(<5 s), the regime in which host-timed wall numbers track device+dispatch
cost rather than tunnel stalls.
"""

from __future__ import annotations

import time
from typing import Any, Dict

PROBE_MB = 12
PROBE_LIMIT_S = 5.0

VALID = "VALID"
INVALID = "INVALID"
DEVICE_CLOCK = "DEVICE_CLOCK"
CPU = "CPU"


def d2h_probe(mb: int = PROBE_MB, limit_s: float = PROBE_LIMIT_S) -> Dict[str, Any]:
    """Time a fresh-buffer device->host fetch on the current default device.

    A FRESH buffer each call: the tunnel caches previously-fetched pages, so
    re-fetching an old array reads cache, not the wire (the r4 12:05 session
    was invalidated by exactly that).
    """
    import jax
    import numpy as np

    if jax.devices()[0].platform == "cpu":
        return {"mode": "cpu", "ok": True}
    a = np.random.default_rng(int(time.time() * 1e3) % 2**31).integers(
        0, 255, (1024, 1024, mb), dtype=np.uint8
    )
    d = jax.device_put(a)
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    np.asarray(d)
    dt = time.perf_counter() - t0
    return {
        "mode": "tpu",
        "seconds": round(dt, 3),
        "mb_per_s": round(mb / dt, 2),
        "ok": dt < limit_s,
    }


def stamp(record: Dict[str, Any], pre: Dict[str, Any], post: Dict[str, Any],
          clock: str = "host") -> Dict[str, Any]:
    """Attach a validity verdict to a measurement record (in place).

    host-clock records are VALID only if BOTH probes passed; device-clock
    records are exempt (chip event clocks cannot be polluted by the tunnel).
    """
    if clock == "device":
        status = DEVICE_CLOCK
    elif pre.get("mode") == "cpu" and post.get("mode") == "cpu":
        status = CPU
    else:
        status = VALID if (pre.get("ok") and post.get("ok")) else INVALID
    record["validity"] = {"status": status, "clock": clock, "pre": pre, "post": post}
    return record


class guarded:
    """Context manager for a host-timed measurement section.

    with guarded() as g:
        ... timed work ...
        record = {...}
    g.stamp(record)   # runs the post-probe, attaches validity
    """

    def __init__(self, clock: str = "host", mb: int = PROBE_MB,
                 limit_s: float = PROBE_LIMIT_S):
        self.clock = clock
        self.mb = mb
        self.limit_s = limit_s
        self.pre: Dict[str, Any] = {}

    def __enter__(self) -> "guarded":
        self.pre = {"ok": True, "mode": "device-clock"} if self.clock == "device" \
            else d2h_probe(self.mb, self.limit_s)
        return self

    def __exit__(self, *exc) -> None:
        return None

    def stamp(self, record: Dict[str, Any]) -> Dict[str, Any]:
        post = {"ok": True, "mode": "device-clock"} if self.clock == "device" \
            else d2h_probe(self.mb, self.limit_s)
        return stamp(record, self.pre, post, clock=self.clock)
