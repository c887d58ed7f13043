"""Credits contract tests, ported from
/root/reference/server-node/tests/creditsService.test.js:26-88."""

import pytest

from image_restoration_platform_tpu.config import CreditsConfig
from image_restoration_platform_tpu.serve import CreditsService, DurableUserStore, Ledger, MemoryStore


@pytest.fixture
def service():
    return CreditsService(
        store=MemoryStore(),
        user_store=DurableUserStore(),
        ledger=Ledger(),
        config=CreditsConfig(daily_free_limit=3),
    )


def test_free_credits_consumed_before_paid(service):
    service.users.set_credits("u1", 10)
    results = [service.check_and_deduct("u1", job_id=f"job-{i}") for i in range(4)]
    assert [r["type"] for r in results] == ["free", "free", "free", "paid"]
    assert results[2]["dailyFreeUsed"] == 3
    assert results[3]["allowed"] is True
    assert results[3]["remainingCredits"] == 9


def test_overdraft_prevented(service):
    # no paid credits, free tier exhausted
    for i in range(3):
        assert service.check_and_deduct("u2", job_id=f"job-{i}")["allowed"]
    denied = service.check_and_deduct("u2", job_id="job-over")
    assert denied["allowed"] is False
    assert denied["type"] == "paid"
    assert denied["remainingCredits"] == 0


def test_refund_restores_balance_with_ledger_audit(service):
    service.users.set_credits("u3", 5)
    # exhaust free tier so the deduction is paid
    for i in range(3):
        service.check_and_deduct("u3", job_id=f"warm-{i}")
    deduct = service.check_and_deduct("u3", amount=2, job_id="job-x")
    assert deduct["allowed"] and deduct["remainingCredits"] == 3

    refund = service.refund("u3", "job-x", amount=2, reason="Job failed")
    assert refund["success"] is True
    assert service.get_balance("u3")["paidCredits"] == 5

    refund_entries = [e for e in service.ledger.entries() if e["type"] == "refund"]
    assert len(refund_entries) == 1
    original = service.ledger.find_deduction_by_job("job-x")
    assert refund_entries[0]["originalTransactionId"] == original["id"]


def test_free_refund(service):
    service.check_and_deduct("u4", job_id="job-f")
    assert service.get_balance("u4")["dailyFreeUsed"] == 1
    result = service.refund("u4", "job-f")
    assert result["success"] and result["type"] == "free"
    assert service.get_balance("u4")["dailyFreeUsed"] == 0


def test_refund_without_original_transaction(service):
    result = service.refund("u5", "never-existed")
    assert result["success"] is False


def test_balance_aggregation(service):
    service.users.set_credits("u6", 7)
    balance = service.get_balance("u6")
    assert balance == {
        "paidCredits": 7,
        "freeCredits": 3,
        "dailyFreeUsed": 0,
        "dailyFreeLimit": 3,
        "totalAvailable": 10,
    }


def test_balance_cache_ttl(service):
    service.users.set_credits("u7", 4)
    assert service.get_balance("u7")["paidCredits"] == 4
    # durable tier changed out-of-band; cached value should be served
    service.users.set_credits("u7", 99)
    assert service.get_balance("u7")["paidCredits"] == 4
