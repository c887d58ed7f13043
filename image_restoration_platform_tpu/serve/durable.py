"""Durable user/ledger tier backed by SQLite.

The reference persists balances in Firestore ``users/<uid>.credits`` with
write-behind sync (credits.js:459-469) and audits every movement to a
``credit_ledger`` collection (credits.js:471-509). This is the pluggable
durable analog: the same ``DurableUserStore``/``Ledger`` interfaces
(serve/credits.py) over a single SQLite file, so balances and audit history
survive process restarts. WAL mode keeps ledger appends non-blocking for
readers; a process-wide lock serializes writers (SQLite's own locking is
per-connection; the serving process is the single writer).
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
import time
import uuid

from ..utils.logging import get_logger

_log = get_logger("durable")

_SCHEMA = """
CREATE TABLE IF NOT EXISTS users (
    user_id TEXT PRIMARY KEY,
    credits INTEGER NOT NULL DEFAULT 0,
    last_updated REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS credit_ledger (
    id TEXT PRIMARY KEY,
    user_id TEXT NOT NULL,
    job_id TEXT,
    amount INTEGER NOT NULL,
    type TEXT NOT NULL,
    reason TEXT,
    original_transaction_id TEXT,
    extras TEXT,
    timestamp REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_ledger_job ON credit_ledger(job_id);
CREATE INDEX IF NOT EXISTS idx_ledger_user ON credit_ledger(user_id);
"""

_LEDGER_COLUMNS = ("userId", "jobId", "amount", "type", "reason", "originalTransactionId")


class SqliteBackend:
    """Shared connection + lock for the user store and ledger pair."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self.lock = threading.RLock()
        self.conn = sqlite3.connect(path, check_same_thread=False)
        self.conn.execute("PRAGMA journal_mode=WAL")
        self.conn.execute("PRAGMA synchronous=NORMAL")
        self.conn.executescript(_SCHEMA)
        self.conn.commit()

    def close(self) -> None:
        with self.lock:
            self.conn.close()


class SqliteUserStore:
    """users.credits durable tier; drop-in for DurableUserStore."""

    def __init__(self, backend: SqliteBackend):
        self._b = backend

    def get_credits(self, user_id: str) -> int:
        with self._b.lock:
            row = self._b.conn.execute(
                "SELECT credits FROM users WHERE user_id = ?", (user_id,)
            ).fetchone()
        return int(row[0]) if row else 0

    def set_credits(self, user_id: str, balance: int) -> None:
        with self._b.lock:
            self._b.conn.execute(
                "INSERT INTO users (user_id, credits, last_updated) VALUES (?, ?, ?) "
                "ON CONFLICT(user_id) DO UPDATE SET credits = excluded.credits, "
                "last_updated = excluded.last_updated",
                (user_id, int(balance), time.time()),
            )
            self._b.conn.commit()

    def grant(self, user_id: str, amount: int) -> int:
        with self._b.lock:
            self._b.conn.execute(
                "INSERT INTO users (user_id, credits, last_updated) VALUES (?, ?, ?) "
                "ON CONFLICT(user_id) DO UPDATE SET credits = users.credits + ?, "
                "last_updated = excluded.last_updated",
                (user_id, int(amount), time.time(), int(amount)),
            )
            self._b.conn.commit()
            row = self._b.conn.execute(
                "SELECT credits FROM users WHERE user_id = ?", (user_id,)
            ).fetchone()
        return int(row[0])


class SqliteLedger:
    """credit_ledger audit trail; drop-in for Ledger."""

    def __init__(self, backend: SqliteBackend):
        self._b = backend

    def add(self, entry: dict) -> str:
        entry = dict(entry)
        entry_id = uuid.uuid4().hex
        extras = {k: v for k, v in entry.items() if k not in _LEDGER_COLUMNS}
        with self._b.lock:
            self._b.conn.execute(
                "INSERT INTO credit_ledger (id, user_id, job_id, amount, type, reason, "
                "original_transaction_id, extras, timestamp) VALUES (?,?,?,?,?,?,?,?,?)",
                (
                    entry_id,
                    entry.get("userId"),
                    entry.get("jobId"),
                    int(entry.get("amount", 0)),
                    entry.get("type", ""),
                    entry.get("reason"),
                    entry.get("originalTransactionId"),
                    json.dumps(extras) if extras else None,
                    time.time(),
                ),
            )
            self._b.conn.commit()
        return entry_id

    @staticmethod
    def _row_to_entry(row) -> dict:
        entry = {
            "id": row[0],
            "userId": row[1],
            "jobId": row[2],
            "amount": int(row[3]),
            "type": row[4],
            "reason": row[5],
            "timestamp": row[8],
        }
        if row[6]:
            entry["originalTransactionId"] = row[6]
        if row[7]:
            entry.update(json.loads(row[7]))
        return entry

    def find_deduction_by_job(self, job_id: str) -> dict | None:
        with self._b.lock:
            row = self._b.conn.execute(
                "SELECT * FROM credit_ledger WHERE job_id = ? AND amount < 0 "
                "ORDER BY timestamp LIMIT 1",
                (job_id,),
            ).fetchone()
        return self._row_to_entry(row) if row else None

    def entries(self) -> list[dict]:
        with self._b.lock:
            rows = self._b.conn.execute(
                "SELECT * FROM credit_ledger ORDER BY timestamp"
            ).fetchall()
        return [self._row_to_entry(r) for r in rows]


def create_durable_tier(path: str | None = None):
    """(user_store, ledger) pair: SQLite when a path is configured
    (DURABLE_DB_PATH), otherwise the in-memory defaults."""
    path = path or os.environ.get("DURABLE_DB_PATH")
    if path:
        backend = SqliteBackend(path)
        _log.info("Durable tier: sqlite", {"path": path})
        return SqliteUserStore(backend), SqliteLedger(backend)
    from .credits import DurableUserStore, Ledger

    return DurableUserStore(), Ledger()
