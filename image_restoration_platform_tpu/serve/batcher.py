"""Continuous micro-batching across concurrent requests.

BASELINE.json config 5: requests arriving within a short window are coalesced
into one device batch per (size-bucket, family) so the TPU sees large batched
launches instead of singletons. The reference's analog is p-limit bounded
fan-out of independent API calls (restorator.js:196); here batching changes
the device economics: one [8, 512, 512, 3] launch amortizes weights reads
(HBM) across 8 requests.

Design: callers block on a Future; a single dispatcher thread drains the
deepest queue, waits up to ``max_wait_ms`` for stragglers (only when the batch
is not already full), stacks inputs, runs the engine, and resolves futures.
A failed batch fails only its own requests.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future

import numpy as np

from ..config import ServingConfig
from ..obs.metrics import get_counters
from ..utils.logging import get_logger
from .engine import RestorationEngine


class _Pending:
    __slots__ = ("canvas", "valid_hw", "is_jpeg", "future", "arrived")

    def __init__(self, canvas, valid_hw, is_jpeg, future):
        self.canvas = canvas
        self.valid_hw = valid_hw
        self.is_jpeg = is_jpeg
        self.future = future
        self.arrived = time.perf_counter()


class MicroBatcher:
    def __init__(self, engine: RestorationEngine, config: ServingConfig | None = None):
        self.engine = engine
        self.config = config or ServingConfig()
        self.logger = get_logger("batcher")
        self._queues: dict[tuple, deque[_Pending]] = {}
        self._cv = threading.Condition()
        self._running = True
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True, name="micro-batcher")
        self._thread.start()

    # -------------------------------------------------------------- public

    def submit(
        self,
        canvas: np.ndarray,
        valid_hw: tuple[int, int],
        is_jpeg: bool,
        family: str,
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Blocking submit; returns (restored_canvas, scores[7], engine_meta)."""
        key = (family, canvas.shape[0], canvas.shape[1])
        pending = _Pending(canvas, np.asarray(valid_hw, np.int32), bool(is_jpeg), Future())
        with self._cv:
            if not self._running:
                raise RuntimeError("batcher is shut down")
            self._queues.setdefault(key, deque()).append(pending)
            self._cv.notify()
        return pending.future.result(timeout=self.config.request_deadline_s)

    def shutdown(self, drain: bool = True) -> None:
        """Queue drain on SIGTERM (SURVEY.md section 5 failure handling)."""
        with self._cv:
            self._running = False
            self._cv.notify_all()
        self._thread.join(timeout=30 if drain else 1)

    def depth(self) -> int:
        with self._cv:
            return sum(len(q) for q in self._queues.values())

    # ---------------------------------------------------------- dispatcher

    def _pick_key(self):
        # deepest queue first; FIFO age as tiebreak
        best, best_score = None, None
        for key, q in self._queues.items():
            if not q:
                continue
            score = (len(q), -q[0].arrived)
            if best_score is None or score > best_score:
                best, best_score = key, score
        return best

    def _dispatch_loop(self) -> None:
        max_wait_s = self.config.max_wait_ms / 1000.0
        while True:
            with self._cv:
                while self._running and not any(self._queues.values()):
                    self._cv.wait(timeout=0.5)
                if not self._running and not any(self._queues.values()):
                    return
                key = self._pick_key()
                q = self._queues[key]
                # linger for stragglers only if the batch isn't already full
                if len(q) < self.config.max_batch and self._running:
                    oldest = q[0].arrived
                    deadline = oldest + max_wait_s
                    while (
                        len(q) < self.config.max_batch
                        and time.perf_counter() < deadline
                        and self._running
                    ):
                        self._cv.wait(timeout=max(0.001, deadline - time.perf_counter()))
                # expire requests that outlived their deadline while queued
                # (per-request deadline, SURVEY.md section 5 device concerns)
                now = time.perf_counter()
                expired = []
                while q and now - q[0].arrived > self.config.request_deadline_s:
                    expired.append(q.popleft())
                batch = [q.popleft() for _ in range(min(len(q), self.config.max_batch))]

            for pending in expired:
                if not pending.future.done():
                    pending.future.set_exception(
                        TimeoutError("request expired in batch queue")
                    )
            if not batch:
                continue
            family = key[0]
            imgs = np.stack([p.canvas for p in batch], axis=0)
            valid_hw = np.stack([p.valid_hw for p in batch], axis=0)
            is_jpeg = np.asarray([p.is_jpeg for p in batch], dtype=np.float32)
            try:
                outs, scores, meta = self.engine.restore_batch(imgs, valid_hw, is_jpeg, family)
                counters = get_counters()
                counters.inc("images_restored_total", len(batch))
                counters.inc("device_seconds_total", meta.get("deviceSeconds", 0.0))
                counters.gauge("last_batch_size", len(batch))
                for i, pending in enumerate(batch):
                    pending.future.set_result((outs[i], scores[i], dict(meta)))
            except Exception as error:  # noqa: BLE001 - batch failure isolation
                self.logger.error("Batch dispatch failed", {"family": family, "error": str(error)})
                for pending in batch:
                    if not pending.future.done():
                        pending.future.set_exception(error)
