"""Job state machine, retry/DLQ/replay, refund compensation, micro-batcher."""

import threading
import time

import numpy as np
import pytest

from image_restoration_platform_tpu.config import QueueConfig, ServingConfig
from image_restoration_platform_tpu.serve import (
    JobQueue,
    JobState,
    JobStore,
    MicroBatcher,
    RestorationEngine,
)


def wait_until(predicate, timeout=15.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(0.02)
    return False


class TestJobStore:
    def test_lifecycle_transitions(self):
        store = JobStore()
        job = store.create("u1", {"prompt": "x"})
        assert job.state is JobState.QUEUED
        store.transition(job.id, JobState.RUNNING)
        store.transition(job.id, JobState.SUCCEEDED, result={"ok": True})
        assert store.get(job.id).state is JobState.SUCCEEDED

    def test_illegal_transition_rejected(self):
        store = JobStore()
        job = store.create("u1", {})
        store.transition(job.id, JobState.RUNNING)
        store.transition(job.id, JobState.SUCCEEDED)
        with pytest.raises(ValueError):
            store.transition(job.id, JobState.RUNNING)

    def test_watch_for_change(self):
        store = JobStore()
        job = store.create("u1", {})

        def later():
            time.sleep(0.1)
            store.transition(job.id, JobState.RUNNING)

        threading.Thread(target=later).start()
        seen = store.wait_for_change(job.id, seen_version=0, timeout=5)
        assert seen.state is JobState.RUNNING

    def test_retention_trims_completed(self):
        store = JobStore(keep_completed=2, keep_failed=10)
        ids = []
        for i in range(5):
            job = store.create("u1", {})
            store.transition(job.id, JobState.RUNNING)
            store.transition(job.id, JobState.SUCCEEDED)
            ids.append(job.id)
        assert store.get(ids[0]) is None
        assert store.get(ids[-1]) is not None


class TestJobQueue:
    def test_success_path(self):
        store = JobStore()
        queue = JobQueue(store, handler=lambda job: {"success": True, "timings": {"total_ms": 1}})
        job = store.create("u1", {})
        queue.enqueue(job)
        assert wait_until(lambda: store.get(job.id).state is JobState.SUCCEEDED)
        queue.shutdown()

    def test_retry_then_success(self):
        store = JobStore()
        attempts = []

        def flaky(job):
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("transient")
            return {"success": True}

        queue = JobQueue(store, handler=flaky, config=QueueConfig(attempts=5, backoff_base_ms=5))
        job = store.create("u1", {})
        queue.enqueue(job)
        assert wait_until(lambda: store.get(job.id).state is JobState.SUCCEEDED)
        assert len(attempts) == 3
        assert store.get(job.id).attempts == 3
        queue.shutdown()

    def test_exhaustion_dead_letter_and_refund_hook(self):
        store = JobStore()
        refunded = []
        queue = JobQueue(
            store,
            handler=lambda job: {"success": False, "error": {"message": "boom"}},
            config=QueueConfig(attempts=2, backoff_base_ms=5),
            on_exhausted=lambda job: refunded.append(job.id),
        )
        job = store.create("u1", {})
        queue.enqueue(job)
        assert wait_until(lambda: store.get(job.id).state is JobState.DEAD_LETTER)
        assert refunded == [job.id]
        assert store.get(job.id).attempts == 2

        # replay preserves the job id and can succeed
        queue.handler = lambda j: {"success": True}
        queue.replay_dead_letter(job.id)
        assert wait_until(lambda: store.get(job.id).state is JobState.SUCCEEDED)
        queue.shutdown()


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        cfg = ServingConfig(size_buckets=(32,), max_batch=4, max_wait_ms=50.0)
        engine = RestorationEngine(serving_config=cfg)
        batcher = MicroBatcher(engine, cfg)
        try:
            # warm the executable so the batching window isn't dominated by compile
            canvas = np.zeros((32, 32, 3), dtype=np.uint8)
            batcher.submit(canvas, (32, 32), False, "restore-unet-small")

            results = [None] * 6
            def call(i):
                results[i] = batcher.submit(canvas + i, (32, 32), False, "restore-unet-small")

            threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)

            metas = [r[2] for r in results]
            assert all(r is not None for r in results)
            assert all(r[0].shape == (32, 32, 3) for r in results)
            assert all(r[1].shape == (7,) for r in results)  # fused scores
            # at least one dispatch must have batched multiple requests
            assert max(m["batchBucket"] for m in metas) >= 2
        finally:
            batcher.shutdown()

    def test_batch_error_isolated_to_batch(self):
        cfg = ServingConfig(size_buckets=(32,), max_batch=2, max_wait_ms=5.0)
        engine = RestorationEngine(serving_config=cfg)
        batcher = MicroBatcher(engine, cfg)
        try:
            with pytest.raises(Exception):
                # unknown family -> engine raises, future carries the error
                batcher.submit(
                    np.zeros((32, 32, 3), dtype=np.uint8), (32, 32), False, "no-such-family"
                )
        finally:
            batcher.shutdown()
