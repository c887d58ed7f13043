"""In-process request metrics: count / average / p95 over a ring buffer.

Contract from the reference (server-node/src/metrics/requestMetrics.js:4-37 and
routes/healthRouter.js:96-107): the last N (default 1000, env
``HEALTH_METRIC_SAMPLE_SIZE``) request durations are sampled in-process and
surfaced by ``GET /health/ready``. We add serving-side counters the reference
only specified (design.md:1583-1630): images/sec, device-seconds, queue depth.
"""

from __future__ import annotations

import math
import os
import threading
import time
from collections import deque


class RequestMetrics:
    def __init__(self, sample_size: int | None = None):
        if sample_size is None:
            try:
                sample_size = int(os.environ.get("HEALTH_METRIC_SAMPLE_SIZE", 1000))
            except ValueError:
                sample_size = 1000
        self._samples: deque[float] = deque(maxlen=max(1, sample_size))
        self._lock = threading.Lock()

    def record(self, duration_ms: float) -> None:
        if not isinstance(duration_ms, (int, float)) or not math.isfinite(duration_ms):
            return
        with self._lock:
            self._samples.append(float(duration_ms))

    def snapshot(self) -> dict:
        with self._lock:
            samples = list(self._samples)
        if not samples:
            return {"count": 0, "averageMs": 0.0, "p95Ms": 0.0}
        ordered = sorted(samples)
        # nearest-rank p95 over the sampled window
        idx = min(len(ordered) - 1, max(0, math.ceil(0.95 * len(ordered)) - 1))
        return {
            "count": len(ordered),
            "averageMs": round(sum(ordered) / len(ordered), 3),
            "p95Ms": round(ordered[idx], 3),
        }


class Counters:
    """Monotonic counters + gauges for the serving loop (TPU accounting)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[str, float] = {}
        self._gauges: dict[str, float] = {}
        self._started = time.monotonic()

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def snapshot(self) -> dict:
        with self._lock:
            uptime = time.monotonic() - self._started
            out = dict(self._counters)
            out.update(self._gauges)
            images = self._counters.get("images_restored_total", 0.0)
            if uptime > 0:
                out["images_per_sec"] = round(images / uptime, 4)
            out["uptime_s"] = round(uptime, 1)
        return out


_global_metrics = RequestMetrics()
_global_counters = Counters()


def record_request_duration(duration_ms: float) -> None:
    _global_metrics.record(duration_ms)


def get_request_metrics() -> dict:
    return _global_metrics.snapshot()


def get_counters() -> Counters:
    return _global_counters
