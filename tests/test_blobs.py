"""Durable blob tier (serve/blobs.py): the GCS analog with per-prefix
retention (originals 30 d / restored 90 d, gcsClient.js:26-42), restart
survival, spooled-file ingestion, and ownership metadata."""

import io
import json
import time
import uuid

import pytest

import fixtures
from image_restoration_platform_tpu.serve.blobs import (
    ORIGINALS,
    RESULTS,
    DiskBlobStore,
    MemoryBlobStore,
    create_blob_store,
)
from image_restoration_platform_tpu.serve.store import MemoryStore


class TestDiskBlobStore:
    def test_put_get_roundtrip_and_meta(self, tmp_path):
        store = DiskBlobStore(str(tmp_path))
        store.put("tok1", b"payload", user_id="alice")
        assert store.get("tok1") == b"payload"
        assert store.get_meta("tok1")["userId"] == "alice"
        assert store.get("missing") is None
        assert store.get_meta("missing") is None

    def test_file_object_put_streams_without_copy(self, tmp_path):
        store = DiskBlobStore(str(tmp_path))
        body = b"x" * (3 << 20)
        store.put("big", io.BytesIO(body), user_id="bob")
        assert store.get("big") == body

    def test_restart_survival(self, tmp_path):
        DiskBlobStore(str(tmp_path)).put("tok2", b"persisted", user_id="alice")
        # fresh instance = restarted process; file mtimes are the clock
        assert DiskBlobStore(str(tmp_path)).get("tok2") == b"persisted"

    def test_per_prefix_retention_sweep(self, tmp_path):
        now = [1000.0]
        store = DiskBlobStore(
            str(tmp_path),
            retention_seconds={ORIGINALS: 30 * 86400, RESULTS: 90 * 86400},
            clock=lambda: now[0],
        )
        store.put("orig", b"o", user_id="alice")
        store.put_result("job1", b"r", user_id="alice")

        # age 31 days: originals expire, results survive (age is mtime-based,
        # so jump the injected clock AND backdate the files)
        import os

        for prefix, name in ((ORIGINALS, "orig"), (RESULTS, "job1")):
            path = os.path.join(str(tmp_path), prefix, name)
            os.utime(path, (now[0], now[0]))
        now[0] += 31 * 86400
        removed = store.sweep()
        assert removed == 1
        assert store.get("orig") is None
        assert store.get_result("job1") == b"r"

        # age 91 days: results expire too
        now[0] += 60 * 86400
        assert store.sweep() == 1
        assert store.get_result("job1") is None
        assert store.stats() == {ORIGINALS: 0, RESULTS: 0}

    def test_expiry_enforced_on_read_before_sweep(self, tmp_path):
        now = [5000.0]
        store = DiskBlobStore(
            str(tmp_path),
            retention_seconds={ORIGINALS: 10.0, RESULTS: 20.0},
            clock=lambda: now[0],
        )
        store.put("t", b"d")
        now[0] += 11.0
        assert store.get("t") is None  # lazily expired, file still on disk

    def test_path_traversal_tokens_rejected(self, tmp_path):
        store = DiskBlobStore(str(tmp_path))
        for bad in ("../evil", "a/b", "", "x" * 200, "dot.dot"):
            with pytest.raises(ValueError):
                store.put(bad, b"d")
            with pytest.raises(ValueError):
                store.get(bad)


class TestMemoryBlobStore:
    def test_roundtrip_and_meta(self):
        store = MemoryBlobStore(MemoryStore())
        store.put("tok", b"data", user_id="alice")
        assert store.get("tok") == b"data"
        assert store.get_meta("tok")["userId"] == "alice"
        store.put_result("job", b"res", user_id="alice")
        assert store.get_result("job") == b"res"
        assert store.get_result_meta("job")["userId"] == "alice"

    def test_create_blob_store_selection(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BLOB_STORE_PATH", raising=False)
        assert isinstance(create_blob_store(MemoryStore()), MemoryBlobStore)
        monkeypatch.setenv("BLOB_STORE_PATH", str(tmp_path / "blobs"))
        assert isinstance(create_blob_store(MemoryStore()), DiskBlobStore)


class TestUploadRestartSubmit:
    """VERDICT r3 item 5 done-criterion: upload -> restart -> submit by token."""

    def test_upload_survives_context_restart(self, tmp_path, monkeypatch):
        import asyncio

        from aiohttp import FormData
        from aiohttp.test_utils import TestClient, TestServer

        from image_restoration_platform_tpu.api import AppContext, create_app
        from image_restoration_platform_tpu.config import Config, ServingConfig

        monkeypatch.setenv("BLOB_STORE_PATH", str(tmp_path / "blobs"))
        cfg = Config()
        cfg.serving = ServingConfig(size_buckets=(64,), max_batch=4, max_wait_ms=2.0)
        auth = {"Authorization": "Bearer dev-user-alice"}

        async def upload(ctx):
            app = create_app(ctx=ctx, config=ctx.config)
            app.on_shutdown.clear()
            async with TestClient(TestServer(app)) as client:
                resp = await client.get("/v1/uploads/signed-url", headers=auth)
                slot = await resp.json()
                body = fixtures.create_clean_image((32, 32))
                resp = await client.put(slot["uploadUrl"], data=body, headers=auth)
                assert resp.status == 200
                return slot["token"]

        async def submit(ctx, token):
            app = create_app(ctx=ctx, config=ctx.config)
            app.on_shutdown.clear()
            async with TestClient(TestServer(app)) as client:
                form = FormData()
                form.add_field("uploadToken", token)
                form.add_field("options", json.dumps({"model": "restore-unet-small"}))
                resp = await client.post(
                    "/v1/jobs?sync=1",
                    data=form,
                    headers={**auth, "Idempotency-Key": str(uuid.uuid4())},
                )
                assert resp.status == 200, await resp.text()
                doc = await resp.json()
                assert doc["status"] == "succeeded"
                # the result blob landed in the durable restored/ tier
                assert ctx.blobs.get_result(doc["id"]) is not None
                assert ctx.blobs.get_result_meta(doc["id"])["userId"] == "alice"

        ctx1 = AppContext(config=cfg, use_batcher=False, queue_workers=1)
        try:
            ctx1.user_store.grant("alice", 10)
            token = asyncio.run(upload(ctx1))
        finally:
            ctx1.shutdown()

        ctx2 = AppContext(config=cfg, use_batcher=False, queue_workers=1)
        try:
            ctx2.user_store.grant("alice", 10)
            asyncio.run(submit(ctx2, token))
        finally:
            ctx2.shutdown()

    def test_foreign_token_not_usable(self, tmp_path):
        store = DiskBlobStore(str(tmp_path))
        store.put("tok", b"owned", user_id="alice")
        meta = store.get_meta("tok")
        # route-level rule (api/routes.py submit_job): meta userId must match
        assert meta["userId"] == "alice"
        assert meta["userId"] != "mallory"


class TestHealthSurfaces:
    def test_ready_reports_blob_tier_and_metrics_gauges(self, tmp_path, monkeypatch):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from image_restoration_platform_tpu.api import AppContext, create_app
        from image_restoration_platform_tpu.config import Config, ServingConfig

        monkeypatch.setenv("BLOB_STORE_PATH", str(tmp_path / "blobs"))
        cfg = Config()
        cfg.serving = ServingConfig(size_buckets=(64,), max_batch=4, max_wait_ms=2.0)
        ctx = AppContext(config=cfg, use_batcher=False, queue_workers=1)
        ctx.blobs.put("seed", b"x", user_id="alice")

        async def check():
            app = create_app(ctx=ctx, config=ctx.config)
            app.on_shutdown.clear()
            async with TestClient(TestServer(app)) as client:
                body = await (await client.get("/health/ready")).json()
                blobs = body["dependencies"]["blobs"]
                assert blobs["status"] == "ok" and blobs["mode"] == "disk"
                assert blobs["originals"] == 1 and blobs["restored"] == 0
                text = await (await client.get("/metrics")).text()
                assert "irp_blobs_originals 1" in text
                assert "irp_blobs_restored 0" in text

        try:
            asyncio.run(check())
        finally:
            ctx.shutdown()


class TestReviewHardening:
    """Round-4 code-review fixes: slot TTL enforcement, fail-closed
    ownership, atomic sidecars + orphan sweep, memory-mode result cap."""

    def test_put_upload_requires_live_slot(self, tmp_path, monkeypatch):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from image_restoration_platform_tpu.api import AppContext, create_app
        from image_restoration_platform_tpu.config import Config, ServingConfig

        monkeypatch.setenv("BLOB_STORE_PATH", str(tmp_path / "blobs"))
        cfg = Config()
        cfg.serving = ServingConfig(size_buckets=(64,), max_batch=4, max_wait_ms=2.0)
        ctx = AppContext(config=cfg, use_batcher=False, queue_workers=1)
        auth = {"Authorization": "Bearer dev-user-alice"}
        body = fixtures.create_clean_image((32, 32))

        async def check():
            app = create_app(ctx=ctx, config=ctx.config)
            app.on_shutdown.clear()
            async with TestClient(TestServer(app)) as client:
                # unknown token: rejected before the body is stored
                resp = await client.put("/v1/uploads/deadbeef", data=body, headers=auth)
                assert resp.status == 404
                # issued slot works for the owner...
                slot = await (await client.get("/v1/uploads/signed-url", headers=auth)).json()
                resp = await client.put(slot["uploadUrl"], data=body, headers=auth)
                assert resp.status == 200
                # ...but another user cannot PUT into it
                resp = await client.put(
                    slot["uploadUrl"], data=body,
                    headers={"Authorization": "Bearer dev-user-mallory"},
                )
                assert resp.status == 403

        try:
            asyncio.run(check())
        finally:
            ctx.shutdown()

    def test_result_download_fails_closed_without_meta(self, tmp_path, monkeypatch):
        import asyncio
        import os

        from aiohttp.test_utils import TestClient, TestServer

        from image_restoration_platform_tpu.api import AppContext, create_app
        from image_restoration_platform_tpu.config import Config, ServingConfig

        monkeypatch.setenv("BLOB_STORE_PATH", str(tmp_path / "blobs"))
        cfg = Config()
        cfg.serving = ServingConfig(size_buckets=(64,), max_batch=4, max_wait_ms=2.0)
        ctx = AppContext(config=cfg, use_batcher=False, queue_workers=1)
        ctx.blobs.put_result("orphanjob", b"\xff\xd8\xffjpegdata", user_id="alice")
        # simulate a crash-truncated sidecar
        os.unlink(os.path.join(str(tmp_path / "blobs"), RESULTS, "orphanjob.meta"))

        async def check():
            app = create_app(ctx=ctx, config=ctx.config)
            app.on_shutdown.clear()
            async with TestClient(TestServer(app)) as client:
                for user in ("alice", "mallory"):
                    resp = await client.get(
                        "/v1/jobs/orphanjob/image",
                        headers={"Authorization": f"Bearer dev-user-{user}"},
                    )
                    assert resp.status == 403, f"{user}: {resp.status}"
                # malformed job id: clean 404, not a 500
                resp = await client.get(
                    "/v1/jobs/..%2Fevil/image",
                    headers={"Authorization": "Bearer dev-user-alice"},
                )
                assert resp.status == 404

        try:
            asyncio.run(check())
        finally:
            ctx.shutdown()

    def test_sweep_removes_orphan_sidecars(self, tmp_path):
        import os

        store = DiskBlobStore(str(tmp_path))
        store.put("keep", b"data", user_id="alice")
        orphan = os.path.join(str(tmp_path), ORIGINALS, "gone.meta")
        with open(orphan, "w") as f:
            f.write("{}")
        store.sweep()
        assert not os.path.exists(orphan)
        assert store.get("keep") == b"data"

    def test_memory_result_ring_caps_retention(self):
        store = MemoryBlobStore(MemoryStore())
        store.MAX_RESULTS = 4
        for i in range(10):
            store.put_result(f"job{i}", b"x" * 10, user_id="alice")
        assert store.get_result("job0") is None  # evicted
        assert store.get_result("job9") == b"x" * 10
        live = sum(store.get_result(f"job{i}") is not None for i in range(10))
        assert live == 4
