"""Durable job state (serve/durable.py SqliteJobStore): the reference's spec
persists the job state machine + results in a Firestore ``jobs`` collection
(design.md:912-933; submit-flow record creation design.md:114-129). Our SQLite
tier must survive a process restart: records, DLQ replay, and crash recovery
of mid-flight jobs."""

import base64
import time

import pytest

import fixtures
from image_restoration_platform_tpu.serve.durable import (
    SqliteJobStore,
    create_job_store,
    get_backend,
)
from image_restoration_platform_tpu.serve.jobs import JobState, JobStore


def _store(path, **kwargs):
    return SqliteJobStore(get_backend(str(path)), **kwargs)


class TestSqliteJobStore:
    def test_records_survive_restart(self, tmp_path):
        db = tmp_path / "jobs.db"
        store = _store(db)
        job = store.create("alice", {"imageB64": "aGk="}, request_id="req-1",
                           traceparent="00-aa-bb-01")
        store.transition(job.id, JobState.RUNNING, attempts=1)
        store.transition(job.id, JobState.SUCCEEDED,
                         result={"success": True, "restoredImage": "aGk="},
                         timings={"total_ms": 12.5})

        reloaded = _store(db)  # fresh instance = restarted process
        got = reloaded.get(job.id)
        assert got is not None
        assert got.state is JobState.SUCCEEDED
        assert got.user_id == "alice"
        assert got.attempts == 1
        assert got.result["restoredImage"] == "aGk="
        assert got.timings == {"total_ms": 12.5}
        assert got.traceparent == "00-aa-bb-01"
        assert got.request_id == "req-1"
        assert got.version == 2

    def test_recover_incomplete_requeues_running(self, tmp_path):
        db = tmp_path / "jobs.db"
        store = _store(db)
        queued = store.create("alice", {})
        running = store.create("alice", {})
        done = store.create("alice", {})
        store.transition(running.id, JobState.RUNNING, attempts=2)
        store.transition(done.id, JobState.RUNNING, attempts=1)
        store.transition(done.id, JobState.SUCCEEDED, result={"success": True})

        reloaded = _store(db)
        recovered = reloaded.recover_incomplete()
        assert {j.id for j in recovered} == {queued.id, running.id}
        # mid-attempt job comes back QUEUED with its attempt budget intact
        assert reloaded.get(running.id).state is JobState.QUEUED
        assert reloaded.get(running.id).attempts == 2
        assert reloaded.get(done.id).state is JobState.SUCCEEDED

    def test_dead_letter_replay_across_restart(self, tmp_path):
        db = tmp_path / "jobs.db"
        store = _store(db)
        job = store.create("bob", {"imageB64": "aGk="})
        store.transition(job.id, JobState.RUNNING, attempts=5)
        store.transition(job.id, JobState.DEAD_LETTER, error={"message": "boom"})

        reloaded = _store(db)
        assert [j.id for j in reloaded.dead_letter_jobs()] == [job.id]
        replayed = reloaded.transition(job.id, JobState.QUEUED, attempts=0, error=None)
        assert replayed.state is JobState.QUEUED
        # and the replay itself is durable
        assert _store(db).get(job.id).state is JobState.QUEUED

    def test_trim_deletes_rows(self, tmp_path):
        db = tmp_path / "jobs.db"
        store = _store(db, keep_completed=2)
        ids = []
        for _ in range(4):
            job = store.create("alice", {})
            store.transition(job.id, JobState.RUNNING, attempts=1)
            store.transition(job.id, JobState.SUCCEEDED, result={"success": True})
            ids.append(job.id)
        reloaded = _store(db)
        assert reloaded.get(ids[0]) is None and reloaded.get(ids[1]) is None
        assert reloaded.get(ids[2]) is not None and reloaded.get(ids[3]) is not None

    def test_result_ttl_purge_is_durable(self, tmp_path):
        db = tmp_path / "jobs.db"
        now = [1000.0]
        store = _store(db, result_retention_s=60.0, clock=lambda: now[0])
        job = store.create("alice", {})
        store.transition(job.id, JobState.RUNNING, attempts=1)
        store.transition(job.id, JobState.SUCCEEDED, result={"success": True})
        now[0] += 3600
        assert store.purge_expired_results() == 1
        got = _store(db).get(job.id)
        assert got.result is None
        assert "expired" in got.error["message"]

    def test_factory_env_selection(self, tmp_path, monkeypatch):
        monkeypatch.delenv("DURABLE_DB_PATH", raising=False)
        assert type(create_job_store()) is JobStore
        monkeypatch.setenv("DURABLE_DB_PATH", str(tmp_path / "d.db"))
        assert isinstance(create_job_store(), SqliteJobStore)


class TestCrashRecoveryEndToEnd:
    """Submit -> kill the context mid-flight -> rebuild -> the recovered job
    runs to completion through the real worker + engine (VERDICT r2 item 2)."""

    def test_job_completes_after_restart(self, tmp_path, monkeypatch):
        monkeypatch.setenv("DURABLE_DB_PATH", str(tmp_path / "durable.db"))
        monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
        from image_restoration_platform_tpu.api import AppContext
        from image_restoration_platform_tpu.config import Config, ServingConfig

        def make_config():
            cfg = Config()
            cfg.serving = ServingConfig(size_buckets=(64,), max_batch=2, max_wait_ms=2.0)
            return cfg

        image_b64 = base64.b64encode(fixtures.create_clean_image((48, 48))).decode()
        payload = {"imageB64": image_b64, "options": {"model": "restore-unet-small"}}

        ctx1 = AppContext(config=make_config(), use_batcher=False, queue_workers=1)
        # create the record and mark it mid-attempt WITHOUT enqueueing: the
        # process "dies" while the worker holds the job
        job = ctx1.jobs.create("alice", payload, request_id="req-crash")
        ctx1.jobs.transition(job.id, JobState.RUNNING, attempts=1)
        ctx1.shutdown()

        ctx2 = AppContext(config=make_config(), use_batcher=False, queue_workers=1)
        try:
            deadline = time.time() + 240
            while time.time() < deadline:
                got = ctx2.jobs.get(job.id)
                if got is not None and got.state in (JobState.SUCCEEDED, JobState.DEAD_LETTER):
                    break
                time.sleep(0.5)
            got = ctx2.jobs.get(job.id)
            assert got is not None, "job lost across restart"
            assert got.state is JobState.SUCCEEDED, (got.state, got.error)
            assert got.result["success"] is True
            assert got.result["restoredImage"]
            # the interrupted attempt still counts against the retry budget
            assert got.attempts >= 2
        finally:
            ctx2.shutdown()
