from .store import MemoryStore, create_store
from .redis_store import RedisStore
from .durable import SqliteJobStore, SqliteLedger, SqliteUserStore, create_durable_tier, create_job_store
from .ratelimit import RateLimiter
from .idempotency import IdempotencyService, payload_hash
from .credits import CreditsService, DurableUserStore, Ledger
from .moderation import ModerationService, ModerationAuditLog
from .engine import RestorationEngine
from .restorator import RestoratorService
from .batcher import MicroBatcher
from .jobs import Job, JobState, JobStore
from .queue import JobQueue

__all__ = [
    "MemoryStore",
    "create_store",
    "RedisStore",
    "SqliteUserStore",
    "SqliteLedger",
    "create_durable_tier",
    "create_job_store",
    "SqliteJobStore",
    "RateLimiter",
    "IdempotencyService",
    "payload_hash",
    "CreditsService",
    "DurableUserStore",
    "Ledger",
    "ModerationService",
    "ModerationAuditLog",
    "RestorationEngine",
    "RestoratorService",
    "MicroBatcher",
    "Job",
    "JobState",
    "JobStore",
    "JobQueue",
]
