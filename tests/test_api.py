"""End-to-end HTTP API tests: the full middleware chain + job lifecycle over
a live aiohttp server (contracts from reference server.js / middleware suite)."""

import asyncio
import base64
import json
import uuid

import pytest
from aiohttp.test_utils import TestClient, TestServer

import fixtures
from image_restoration_platform_tpu.api import AppContext, create_app
from image_restoration_platform_tpu.config import Config, ServingConfig

AUTH = {"Authorization": "Bearer dev-user-alice"}


def _config() -> Config:
    cfg = Config()
    cfg.serving = ServingConfig(size_buckets=(64,), max_batch=4, max_wait_ms=2.0)
    return cfg


@pytest.fixture(scope="module")
def ctx():
    context = AppContext(config=_config(), use_batcher=False, queue_workers=1)
    context.user_store.grant("alice", 1000)  # tests outnumber the daily free tier
    yield context
    context.shutdown()


def run(ctx, coro_fn):
    async def runner():
        app = create_app(ctx=ctx, config=ctx.config)
        app.on_shutdown.clear()  # module-scoped ctx outlives each test server
        async with TestClient(TestServer(app)) as client:
            return await coro_fn(client)

    return asyncio.run(runner())


def form_for(image_bytes, prompt=None, filename="photo.jpg"):
    from aiohttp import FormData

    form = FormData()
    form.add_field("image", image_bytes, filename=filename, content_type="image/jpeg")
    if prompt:
        form.add_field("prompt", prompt)
    form.add_field("options", json.dumps({"model": "restore-unet-small"}))
    return form


def idem():
    return {"Idempotency-Key": str(uuid.uuid4())}


class TestHealth:
    def test_live(self, ctx):
        async def check(client):
            resp = await client.get("/health/live")
            assert resp.status == 200
            body = await resp.json()
            assert body["status"] == "ok"
            assert "X-Request-Id" in resp.headers

        run(ctx, check)

    def test_ready_reports_dependencies(self, ctx):
        async def check(client):
            resp = await client.get("/health/ready")
            assert resp.status == 200
            body = await resp.json()
            assert body["status"] in ("ok", "degraded")
            assert "store" in body["dependencies"]
            assert "device" in body["dependencies"]
            assert "p95Ms" in body["metrics"]["requests"]
            # per-dependency probe latency (healthRouter.js:4-71 parity)
            for dep in body["dependencies"].values():
                assert isinstance(dep["latencyMs"], (int, float))
                assert 0 <= dep["latencyMs"] < 10_000

        run(ctx, check)


class TestAuth:
    def test_v1_requires_bearer(self, ctx):
        async def check(client):
            resp = await client.get("/v1/credits/balance")
            assert resp.status == 401
            assert resp.content_type == "application/problem+json"
            body = await resp.json()
            assert body["status"] == 401

        run(ctx, check)

    def test_mock_token_accepted(self, ctx):
        async def check(client):
            resp = await client.get("/v1/credits/balance", headers=AUTH)
            assert resp.status == 200
            body = await resp.json()
            assert body["dailyFreeLimit"] == 3

        run(ctx, check)


class TestErrorsAndCors:
    def test_unknown_route_is_problem_json(self, ctx):
        async def check(client):
            resp = await client.get("/no/such/route")
            assert resp.status == 404
            assert resp.content_type == "application/problem+json"

        run(ctx, check)

    def test_cors_preflight(self, ctx, monkeypatch):
        monkeypatch.setenv("FRONTEND_URL", "https://app.example.com")

        async def check(client):
            resp = await client.options(
                "/v1/jobs", headers={"Origin": "https://app.example.com"}
            )
            assert resp.status == 204
            assert resp.headers["Access-Control-Allow-Origin"] == "https://app.example.com"
            # other origins get no CORS grant
            resp = await client.options("/v1/jobs", headers={"Origin": "https://evil.example"})
            assert "Access-Control-Allow-Origin" not in resp.headers

        run(ctx, check)


class TestRequestContext:
    def test_request_id_echo_and_traceparent(self, ctx):
        async def check(client):
            headers = {
                "X-Request-Id": "my-req-1",
                "traceparent": "00-0af7651916cd43dd8448eb211c80319c-b7ad6b7169203331-01",
            }
            resp = await client.get("/health/live", headers=headers)
            assert resp.headers["X-Request-Id"] == "my-req-1"
            assert resp.headers["traceparent"] == headers["traceparent"]

        run(ctx, check)


class TestJobSubmission:
    def test_missing_idempotency_key(self, ctx):
        async def check(client):
            resp = await client.post(
                "/v1/jobs", data=form_for(fixtures.create_clean_image((32, 32))), headers=AUTH
            )
            assert resp.status == 400
            body = await resp.json()
            assert body["title"] == "Idempotency Key Required"

        run(ctx, check)

    def test_invalid_extension_415(self, ctx):
        async def check(client):
            resp = await client.post(
                "/v1/jobs",
                data=form_for(fixtures.create_clean_image((32, 32)), filename="x.gif"),
                headers={**AUTH, **idem()},
            )
            assert resp.status == 415

        run(ctx, check)

    def test_polyglot_jpeg_rejected_422(self, ctx):
        """Valid magic bytes but corrupt body: passes the sniff, must fail
        preprocessing with a 422 problem (fuzz case from design.md:1248-1274)."""

        async def check(client):
            polyglot = b"\xff\xd8\xff\xe0" + bytes(range(256)) * 8
            resp = await client.post(
                "/v1/jobs",
                data=form_for(polyglot, filename="x.jpg"),
                headers={**AUTH, **idem()},
            )
            assert resp.status == 422
            body = await resp.json()
            assert body["title"] == "Image Preprocessing Failed"

        run(ctx, check)

    def test_magic_byte_mismatch_415(self, ctx):
        async def check(client):
            resp = await client.post(
                "/v1/jobs",
                data=form_for(b"GIF89a fake image data", filename="x.jpg"),
                headers={**AUTH, **idem()},
            )
            assert resp.status == 415
            body = await resp.json()
            assert body["title"] == "Unsupported Media Type"

        run(ctx, check)

    def test_sync_restore_end_to_end(self, ctx):
        async def check(client):
            # size chosen so the preprocessed JPEG's len % 100 lands in the
            # mock moderation pass band (the deterministic mock is contract)
            image = fixtures.create_dark_image((48, 48))
            resp = await client.post(
                "/v1/jobs?sync=1",
                data=form_for(image, prompt="fix my photo"),
                headers={**AUTH, **idem()},
            )
            assert resp.status == 200
            body = await resp.json()
            assert body["status"] == "succeeded"
            result = body["result"]
            assert result["success"] is True
            assert "fix my photo" in result["enhancedPrompt"]
            for key in ("classify_ms", "prompt_ms", "restore_ms", "total_ms"):
                assert key in result["timings"]
            assert base64.b64decode(result["restoredImage"])[:3] == b"\xff\xd8\xff"
            assert body["credits"]["type"] in ("free", "paid")

        run(ctx, check)

    def test_async_job_lifecycle_with_polling(self, ctx):
        async def check(client):
            image = fixtures.create_clean_image((32, 32))
            resp = await client.post(
                "/v1/jobs", data=form_for(image), headers={**AUTH, **idem()}
            )
            assert resp.status == 202
            job_id = (await resp.json())["id"]
            assert resp.headers["Location"] == f"/v1/jobs/{job_id}"

            for _ in range(100):
                status = await (await client.get(f"/v1/jobs/{job_id}", headers=AUTH)).json()
                if status["status"] in ("succeeded", "failed", "dead_letter"):
                    break
                await asyncio.sleep(0.2)
            assert status["status"] == "succeeded"
            assert status["result"]["success"] is True

        run(ctx, check)

    def test_job_ownership_enforced(self, ctx):
        async def check(client):
            image = fixtures.create_clean_image((32, 32))
            resp = await client.post(
                "/v1/jobs", data=form_for(image), headers={**AUTH, **idem()}
            )
            job_id = (await resp.json())["id"]
            resp = await client.get(
                f"/v1/jobs/{job_id}", headers={"Authorization": "Bearer dev-user-mallory"}
            )
            assert resp.status == 403

        run(ctx, check)

    def test_idempotent_replay(self, ctx):
        async def check(client):
            image = fixtures.create_clean_image((32, 32))
            key = idem()
            r1 = await client.post("/v1/jobs", data=form_for(image), headers={**AUTH, **key})
            body1 = await r1.json()
            # same key + same payload -> replayed response, same job id
            r2 = await client.post("/v1/jobs", data=form_for(image), headers={**AUTH, **key})
            body2 = await r2.json()
            assert r2.headers.get("Idempotency-Replayed") == "true"
            assert body2["id"] == body1["id"]

        run(ctx, check)

    def test_rate_limit_headers_present(self, ctx):
        async def check(client):
            resp = await client.get("/v1/credits/balance", headers=AUTH)
            assert "RateLimit-Limit" in resp.headers
            assert "RateLimit-Remaining" in resp.headers

        run(ctx, check)


class TestBillingAndLimits:
    def test_insufficient_credits_402(self, ctx):
        async def check(client):
            # a fresh user with exhausted free tier and no paid credits
            auth = {"Authorization": "Bearer dev-user-broke"}
            image = fixtures.create_clean_image((32, 32))
            for _ in range(3):
                r = await client.post("/v1/jobs", data=form_for(image), headers={**auth, **idem()})
                assert r.status == 202
            r = await client.post("/v1/jobs", data=form_for(image), headers={**auth, **idem()})
            assert r.status == 402
            body = await r.json()
            assert body["title"] == "Insufficient Credits"
            assert body["remainingCredits"] == 0

        run(ctx, check)

    def test_oversized_upload_413(self, ctx):
        async def check(client):
            big = b"\xff\xd8\xff" + b"\x00" * (11 * 1024 * 1024)
            resp = await client.post(
                "/v1/jobs", data=form_for(big), headers={**AUTH, **idem()}
            )
            assert resp.status == 413
            body = await resp.json()
            assert body["title"] == "File Too Large"
            assert "Retry-After" in resp.headers

        run(ctx, check)

    def test_sync_failure_refunds_credit(self, ctx):
        async def check(client):
            auth = {"Authorization": "Bearer dev-user-refundee"}
            balance_before = (await (await client.get("/v1/credits/balance", headers=auth)).json())
            # unknown model -> sync job fails -> free credit refunded
            from aiohttp import FormData

            form = FormData()
            form.add_field("image", fixtures.create_clean_image((32, 32)), filename="x.jpg")
            form.add_field("options", json.dumps({"model": "nope"}))
            resp = await client.post("/v1/jobs?sync=1", data=form, headers={**auth, **idem()})
            assert resp.status == 502
            balance_after = (await (await client.get("/v1/credits/balance", headers=auth)).json())
            assert balance_after["dailyFreeUsed"] == balance_before["dailyFreeUsed"]

        run(ctx, check)


class TestUploadsFlow:
    def test_signed_url_then_submit(self, ctx):
        async def check(client):
            resp = await client.get("/v1/uploads/signed-url", headers=AUTH)
            slot = await resp.json()
            assert slot["uploadUrl"].startswith("/v1/uploads/")

            image = fixtures.create_clean_image((32, 32))
            resp = await client.put(slot["uploadUrl"], data=image, headers=AUTH)
            assert resp.status == 200

            from aiohttp import FormData

            form = FormData()
            form.add_field("uploadToken", slot["token"])
            form.add_field("options", json.dumps({"model": "restore-unet-small"}))
            resp = await client.post(
                "/v1/jobs?sync=1", data=form, headers={**AUTH, **idem()}
            )
            assert resp.status == 200

        run(ctx, check)


class TestSSE:
    def test_stream_emits_terminal_event(self, ctx):
        async def check(client):
            image = fixtures.create_clean_image((32, 32))
            resp = await client.post(
                "/v1/jobs", data=form_for(image), headers={**AUTH, **idem()}
            )
            job_id = (await resp.json())["id"]

            async with client.get(f"/v1/jobs/{job_id}/stream", headers=AUTH) as stream:
                assert stream.content_type == "text/event-stream"
                terminal = None
                async for line in stream.content:
                    text = line.decode().strip()
                    if text.startswith("data:"):
                        doc = json.loads(text[5:])
                        if doc["status"] in ("succeeded", "failed", "dead_letter"):
                            terminal = doc
                            break
                assert terminal is not None and terminal["status"] == "succeeded"

        run(ctx, check)


class TestMetricsAndDownload:
    def test_metrics_endpoint(self, ctx):
        async def check(client):
            resp = await client.get("/metrics")
            assert resp.status == 200
            text = await resp.text()
            assert "http_requests_total" in text

        run(ctx, check)

    def test_job_image_download(self, ctx):
        async def check(client):
            image = fixtures.create_clean_image((32, 32))
            resp = await client.post(
                "/v1/jobs?sync=1", data=form_for(image), headers={**AUTH, **idem()}
            )
            job_id = (await resp.json())["id"]
            resp = await client.get(f"/v1/jobs/{job_id}/image", headers=AUTH)
            assert resp.status == 200
            assert resp.content_type == "image/jpeg"
            body = await resp.read()
            assert body[:3] == b"\xff\xd8\xff"
            assert "attachment" in resp.headers["Content-Disposition"]

        run(ctx, check)


class TestStripeWebhook:
    @staticmethod
    def _sign(event: bytes, ts: float, secret: bytes = b"whsec_test") -> str:
        import hashlib
        import hmac as hmac_mod

        sig = hmac_mod.new(secret, f"{ts}.".encode() + event, hashlib.sha256).hexdigest()
        return f"t={ts},v1={sig}"

    def test_signed_grant(self, ctx, monkeypatch):
        import time as time_mod

        monkeypatch.setenv("STRIPE_WEBHOOK_SECRET", "whsec_test")

        async def check(client):
            event = json.dumps(
                {
                    "id": "evt_grant_1",
                    "type": "checkout.session.completed",
                    "data": {"object": {"metadata": {"userId": "buyer", "credits": "25"}}},
                }
            ).encode()
            ts = time_mod.time()
            resp = await client.post(
                "/v1/webhooks/stripe",
                data=event,
                headers={"Stripe-Signature": self._sign(event, ts)},
            )
            assert resp.status == 200
            assert (await resp.json())["credits"] == 25

            balance = await (
                await client.get(
                    "/v1/credits/balance", headers={"Authorization": "Bearer dev-user-buyer"}
                )
            ).json()
            assert balance["paidCredits"] == 25

            # tampered signature rejected
            resp = await client.post(
                "/v1/webhooks/stripe",
                data=event,
                headers={"Stripe-Signature": f"t={ts},v1={'0'*64}"},
            )
            assert resp.status == 401

            # replayed (signed, but same event id): no second grant
            resp = await client.post(
                "/v1/webhooks/stripe",
                data=event,
                headers={"Stripe-Signature": self._sign(event, ts)},
            )
            assert resp.status == 200
            assert (await resp.json()).get("duplicate") is True
            balance = await (
                await client.get(
                    "/v1/credits/balance", headers={"Authorization": "Bearer dev-user-buyer"}
                )
            ).json()
            assert balance["paidCredits"] == 25

        run(ctx, check)

    def test_stale_timestamp_rejected(self, ctx, monkeypatch):
        import time as time_mod

        monkeypatch.setenv("STRIPE_WEBHOOK_SECRET", "whsec_test")

        async def check(client):
            event = json.dumps(
                {
                    "id": "evt_stale",
                    "type": "checkout.session.completed",
                    "data": {"object": {"metadata": {"userId": "buyer2", "credits": "5"}}},
                }
            ).encode()
            ts = time_mod.time() - 3600  # far outside the 5-minute tolerance
            resp = await client.post(
                "/v1/webhooks/stripe",
                data=event,
                headers={"Stripe-Signature": self._sign(event, ts)},
            )
            assert resp.status == 401

        run(ctx, check)

    def test_unconfigured_secret_rejected(self, ctx, monkeypatch):
        monkeypatch.delenv("STRIPE_WEBHOOK_SECRET", raising=False)

        async def check(client):
            event = json.dumps(
                {
                    "type": "checkout.session.completed",
                    "data": {"object": {"metadata": {"userId": "freeloader", "credits": "999"}}},
                }
            ).encode()
            resp = await client.post("/v1/webhooks/stripe", data=event)
            assert resp.status == 503
            balance = await (
                await client.get(
                    "/v1/credits/balance",
                    headers={"Authorization": "Bearer dev-user-freeloader"},
                )
            ).json()
            assert balance["paidCredits"] == 0

        run(ctx, check)


class TestRestoreSingleAlias:
    def test_api_restore_single(self, ctx):
        async def check(client):
            from aiohttp import FormData

            form = FormData()
            form.add_field("image", fixtures.create_dark_image((32, 32)), filename="p.jpg")
            form.add_field("prompt", "brighten this")
            resp = await client.post("/api/restore/single", data=form, headers=AUTH)
            assert resp.status == 200
            body = await resp.json()
            assert body["success"] is True
            assert "brighten this" in body["enhancedPrompt"]

        run(ctx, check)


class TestAdmin:
    def test_analytics(self, ctx, monkeypatch):
        monkeypatch.setenv("ADMIN_USERS", "alice")

        async def check(client):
            resp = await client.get("/v1/admin/analytics", headers=AUTH)
            assert resp.status == 200
            body = await resp.json()
            assert "credits" in body and "serving" in body and "queue" in body
            assert body["tpu"]["deviceSecondsTotal"] >= 0

        run(ctx, check)

    def test_admin_fail_closed_when_unconfigured(self, ctx, monkeypatch):
        monkeypatch.delenv("ADMIN_USERS", raising=False)
        monkeypatch.delenv("ADMIN_DEV_OPEN", raising=False)

        async def check(client):
            resp = await client.get("/v1/admin/analytics", headers=AUTH)
            assert resp.status == 403
            resp = await client.post(
                "/v1/admin/credits/grant",
                json={"userId": "alice", "amount": 5},
                headers={**AUTH, **idem()},
            )
            assert resp.status == 403

        run(ctx, check)

    def test_admin_dev_open_flag(self, ctx, monkeypatch):
        """The dev escape hatch requires BOTH flags (VERDICT r3 weak #6)."""
        monkeypatch.delenv("ADMIN_USERS", raising=False)
        monkeypatch.setenv("ADMIN_DEV_OPEN", "1")
        monkeypatch.setenv("ALLOW_DEGRADED", "1")

        async def check(client):
            resp = await client.get("/v1/admin/analytics", headers=AUTH)
            assert resp.status == 200

        run(ctx, check)

    def test_admin_dev_open_refused_without_allow_degraded(self, ctx, monkeypatch):
        """ADMIN_DEV_OPEN alone (e.g. a stray env var on a production box)
        must NOT open admin routes; it only works with ALLOW_DEGRADED=1."""
        monkeypatch.delenv("ADMIN_USERS", raising=False)
        monkeypatch.setenv("ADMIN_DEV_OPEN", "1")
        monkeypatch.delenv("ALLOW_DEGRADED", raising=False)

        async def check(client):
            resp = await client.get("/v1/admin/analytics", headers=AUTH)
            assert resp.status == 403

        run(ctx, check)

    def test_admin_traces_limit_validation(self, ctx, monkeypatch):
        """Negative limits must not bypass the 512 cap via spans[-limit:],
        and non-numeric limits are a 400, not a 500 (ADVICE r3 #2)."""
        monkeypatch.setenv("ADMIN_USERS", "alice")

        async def check(client):
            resp = await client.get("/v1/admin/traces?limit=-1", headers=AUTH)
            assert resp.status == 200
            body = await resp.json()
            scope = body["resourceSpans"][0]["scopeSpans"][0]
            assert len(scope["spans"]) <= 1  # clamped to >= 1, not the whole ring
            resp = await client.get("/v1/admin/traces?limit=bogus", headers=AUTH)
            assert resp.status == 400

        run(ctx, check)

    def test_admin_allowlist(self, ctx, monkeypatch):
        monkeypatch.setenv("ADMIN_USERS", "ops-team")

        async def check(client):
            resp = await client.get("/v1/admin/analytics", headers=AUTH)
            assert resp.status == 403
            resp = await client.get(
                "/v1/admin/analytics", headers={"Authorization": "Bearer dev-user-ops-team"}
            )
            assert resp.status == 200

        run(ctx, check)

    def test_admin_probe_d2h(self, ctx, monkeypatch):
        """The serving process runs the tunnel probe itself (one TPU client
        at a time); on the CPU test backend it reports mode=cpu ok=True."""
        monkeypatch.setenv("ADMIN_USERS", "alice")

        async def check(client):
            resp = await client.post(
                "/v1/admin/probe/d2h", headers={**AUTH, **idem()}
            )
            assert resp.status == 200
            body = await resp.json()
            assert body["ok"] is True and body["mode"] == "cpu"
            resp = await client.post(
                "/v1/admin/probe/d2h?mb=bogus", headers={**AUTH, **idem()}
            )
            assert resp.status == 400

        run(ctx, check)

    def test_traces_otlp_export(self, ctx, monkeypatch):
        monkeypatch.setenv("ADMIN_USERS", "alice")

        async def check(client):
            # generate at least one span via a traced service path
            from image_restoration_platform_tpu.obs.tracing import get_tracer

            with get_tracer("test").span("test.span", {"k": "v", "n": 3}) as s:
                s.add_event("checkpoint", {"i": 1})

            resp = await client.get("/v1/admin/traces?limit=10", headers=AUTH)
            assert resp.status == 200
            body = await resp.json()
            scope = body["resourceSpans"][0]["scopeSpans"][0]
            spans = scope["spans"]
            assert spans, "span ring should not be empty"
            ours = [s for s in spans if s["name"] == "test.span"]
            assert ours
            span = ours[-1]
            # OTLP/JSON shape: ids, epoch-nano stamps, typed attributes
            assert len(span["traceId"]) == 32 and len(span["spanId"]) == 16
            assert int(span["endTimeUnixNano"]) >= int(span["startTimeUnixNano"])
            assert int(span["startTimeUnixNano"]) > 1_600_000_000 * 10**9
            attrs = {a["key"]: a["value"] for a in span["attributes"]}
            assert attrs["k"] == {"stringValue": "v"}
            assert attrs["n"] == {"intValue": "3"}
            assert span["status"]["code"] == 1  # OK
            assert span["events"][0]["name"] == "checkpoint"

        run(ctx, check)

    def test_grant_credits(self, ctx, monkeypatch):
        monkeypatch.setenv("ADMIN_USERS", "alice")

        async def check(client):
            resp = await client.post(
                "/v1/admin/credits/grant",
                json={"userId": "alice", "amount": 5},
                headers={**AUTH, **idem()},
            )
            assert resp.status == 200
            balance = await (await client.get("/v1/credits/balance", headers=AUTH)).json()
            assert balance["paidCredits"] >= 5

        run(ctx, check)


class TestWebConsole:
    def test_index_and_assets_served(self, ctx):
        async def check(client):
            resp = await client.get("/")
            assert resp.status == 200
            body = await resp.text()
            assert "dev console" in body and "console.js" in body
            for asset in ("console.js", "console.css", "index.html"):
                resp = await client.get(f"/{asset}")
                assert resp.status == 200
            resp = await client.get("/does-not-exist.js")
            assert resp.status == 404

        run(ctx, check)
