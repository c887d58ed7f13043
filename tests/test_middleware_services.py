"""Rate limit, idempotency, and moderation service contracts
(reference: tests/middleware.test.js + middleware/rateLimit.js,
idempotency.js, services/moderation.js)."""

import time
import uuid

from image_restoration_platform_tpu.config import RateLimitConfig
from image_restoration_platform_tpu.serve import (
    IdempotencyService,
    MemoryStore,
    ModerationService,
    RateLimiter,
    payload_hash,
)


class TestRateLimiter:
    def test_user_limit_and_headers(self):
        limiter = RateLimiter(
            MemoryStore(), RateLimitConfig(user_limit=2, user_interval_s=60, ip_limit=100)
        )
        headers, problem = limiter.check("alice", "1.2.3.4")
        assert problem is None
        assert headers["RateLimit-Limit"] == "2"
        assert headers["RateLimit-Remaining"] == "1"

        limiter.check("alice", "1.2.3.4")
        headers, problem = limiter.check("alice", "1.2.3.4")
        assert problem is not None and problem.status == 429
        assert "Retry-After" in headers
        assert problem.extras["retryAfter"] >= 1

    def test_ip_limit_independent(self):
        limiter = RateLimiter(
            MemoryStore(), RateLimitConfig(user_limit=100, ip_limit=1)
        )
        _, problem = limiter.check(None, "9.9.9.9")
        assert problem is None
        _, problem = limiter.check(None, "9.9.9.9")
        assert problem is not None
        _, problem = limiter.check(None, "8.8.8.8")
        assert problem is None

    def test_window_reset(self):
        now = [1000.0]
        store = MemoryStore(clock=lambda: now[0])
        limiter = RateLimiter(store, RateLimitConfig(user_limit=1, user_interval_s=60))
        limiter.check("bob", None)
        _, problem = limiter.check("bob", None)
        assert problem is not None
        now[0] += 61
        _, problem = limiter.check("bob", None)
        assert problem is None


class TestIdempotency:
    def test_requires_uuid_key(self):
        svc = IdempotencyService(MemoryStore())
        assert svc.validate_key(None).status == 400
        assert svc.validate_key("not-a-uuid").status == 400
        assert svc.validate_key(str(uuid.uuid4())) is None

    def test_replay_and_conflict(self):
        svc = IdempotencyService(MemoryStore())
        key = str(uuid.uuid4())
        fp = payload_hash("POST", "/v1/jobs", b"body-1")

        cached, problem = svc.lookup(key, fp)
        assert cached is None and problem is None

        svc.record(key, fp, 202, {"Location": "/v1/jobs/123"}, b'{"id":"123"}', "application/json")
        cached, problem = svc.lookup(key, fp)
        assert problem is None
        assert cached.status == 202
        assert cached.headers["Location"] == "/v1/jobs/123"
        assert cached.body == b'{"id":"123"}'

        other_fp = payload_hash("POST", "/v1/jobs", b"body-2")
        cached, problem = svc.lookup(key, other_fp)
        assert cached is None and problem.status == 409

    def test_5xx_not_cached(self):
        svc = IdempotencyService(MemoryStore())
        key = str(uuid.uuid4())
        fp = payload_hash("POST", "/v1/jobs", b"x")
        svc.record(key, fp, 500, {}, b"oops", "text/plain")
        cached, _ = svc.lookup(key, fp)
        assert cached is None

    def test_ttl_expiry(self):
        now = [0.0]
        store = MemoryStore(clock=lambda: now[0])
        svc = IdempotencyService(store, ttl_seconds=10)
        key = str(uuid.uuid4())
        fp = payload_hash("POST", "/x", None)
        svc.record(key, fp, 200, {}, b"ok", "text/plain")
        assert svc.lookup(key, fp)[0] is not None
        now[0] = 11.0
        assert svc.lookup(key, fp)[0] is None


class TestModeration:
    def test_mock_deterministic_allow(self):
        svc = ModerationService()
        result = svc.moderate(b"x" * 100)  # 100 % 100 == 0 -> pass bucket
        assert result["allowed"] is True
        assert result["flags"]["adult"] == "VERY_UNLIKELY"

    def test_mock_deterministic_reject(self):
        svc = ModerationService()
        result = svc.moderate(b"x" * 195)  # 195 % 100 == 95 -> reject bucket
        assert result["allowed"] is False
        assert "racy" in result["rejection"]["categories"]
        assert result["rejection"]["reason"] == "Content violates community guidelines"

    def test_fail_closed_on_error(self):
        def broken(_):
            raise RuntimeError("vision down")

        svc = ModerationService(vision_client=broken)
        result = svc.moderate(b"anything")
        assert result["allowed"] is False
        assert result["rejection"]["categories"] == ["moderation-service-error"]
        assert result["error"]["code"] == "MODERATION_SERVICE_ERROR"

    def test_audit_trail(self):
        svc = ModerationService()
        svc.moderate(b"x" * 100, {"userId": "u1", "jobId": "j1"})
        entries = svc.audit.entries()
        assert len(entries) == 1
        assert entries[0]["userId"] == "u1"
        assert entries[0]["allowed"] is True

    def test_custom_vision_backend(self):
        svc = ModerationService(
            vision_client=lambda b: {
                "adult": "VERY_LIKELY",
                "violence": "UNLIKELY",
                "racy": "UNLIKELY",
                "spoof": "UNLIKELY",
                "medical": "UNLIKELY",
            }
        )
        result = svc.moderate(b"img")
        assert result["allowed"] is False
        assert result["rejection"]["categories"] == ["adult"]
        assert result["confidence"] == 1.0
