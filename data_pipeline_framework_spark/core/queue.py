"""Work-item queue: SQLite-backed priority queue driving batch ingestion.

Parity with reference core/queue_manager.py: `queue_items` table with a
priority + FIFO index (:61-84), status state machine PENDING->PROCESSING->
COMPLETED/FAILED (:16-21), atomic claim of the next item (:142-167), and
the continuous processing loop (reference scripts/queue_processor.py).

This is driver-side metadata (SURVEY §1.1) — each claimed item compiles to
one Spark job via core.Pipeline; the queue itself never touches executors.
"""

from __future__ import annotations

import json
import sqlite3
import time
from dataclasses import dataclass
from enum import Enum
from pathlib import Path


class QueueStatus(str, Enum):
    PENDING = "pending"
    PROCESSING = "processing"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclass
class QueueItem:
    id: int
    file_path: str
    table_name: str
    priority: int
    status: str
    config: dict | None
    error: str | None
    created_at: float
    updated_at: float


_DDL = """
CREATE TABLE IF NOT EXISTS queue_items (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    file_path TEXT NOT NULL,
    table_name TEXT NOT NULL,
    priority INTEGER NOT NULL DEFAULT 5,
    status TEXT NOT NULL DEFAULT 'pending',
    config TEXT,
    error TEXT,
    created_at REAL NOT NULL,
    updated_at REAL NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_queue_priority
    ON queue_items (status, priority DESC, id ASC);
"""


class QueueManager:
    def __init__(self, db_path: str | Path = "pipeline_queue.db"):
        self._conn = sqlite3.connect(str(db_path))
        self._conn.executescript(_DDL)
        self._conn.commit()

    # -- producer -----------------------------------------------------------

    def add(
        self,
        file_path: str,
        table_name: str,
        priority: int = 5,
        config: dict | None = None,
    ) -> int:
        """Enqueue a file for ingestion (reference queue_manager.py:86-140)."""
        now = time.time()
        cur = self._conn.execute(
            "INSERT INTO queue_items"
            " (file_path, table_name, priority, status, config,"
            "  created_at, updated_at) VALUES (?, ?, ?, ?, ?, ?, ?)",
            (file_path, table_name, priority, QueueStatus.PENDING.value,
             json.dumps(config) if config else None, now, now),
        )
        self._conn.commit()
        return cur.lastrowid

    # -- consumer -----------------------------------------------------------

    def next_item(self) -> QueueItem | None:
        """Atomically claim the highest-priority pending item (priority
        DESC, FIFO within priority — reference queue_manager.py:142-167).

        Cross-process safe: the guarded UPDATE's rowcount decides whether
        THIS connection won the claim; on a lost race (another worker
        flipped the row between our SELECT and UPDATE) it retries with the
        next candidate instead of processing a stolen item."""
        while True:
            with self._conn:  # single transaction: select + mark
                row = self._conn.execute(
                    "SELECT id FROM queue_items WHERE status = ?"
                    " ORDER BY priority DESC, id ASC LIMIT 1",
                    (QueueStatus.PENDING.value,),
                ).fetchone()
                if row is None:
                    return None
                claimed = self._conn.execute(
                    "UPDATE queue_items SET status = ?, updated_at = ?"
                    " WHERE id = ? AND status = ?",
                    (QueueStatus.PROCESSING.value, time.time(), row[0],
                     QueueStatus.PENDING.value),
                ).rowcount
            if claimed:
                return self.get(row[0])

    def complete(self, item_id: int) -> None:
        self._set_status(item_id, QueueStatus.COMPLETED, None)

    def fail(self, item_id: int, error: str) -> None:
        self._set_status(item_id, QueueStatus.FAILED, error)

    def _set_status(self, item_id: int, status: QueueStatus, error: str | None):
        self._conn.execute(
            "UPDATE queue_items SET status = ?, error = ?, updated_at = ?"
            " WHERE id = ?",
            (status.value, error, time.time(), item_id),
        )
        self._conn.commit()

    # -- introspection ------------------------------------------------------

    def get(self, item_id: int) -> QueueItem | None:
        row = self._conn.execute(
            "SELECT id, file_path, table_name, priority, status, config,"
            " error, created_at, updated_at FROM queue_items WHERE id = ?",
            (item_id,),
        ).fetchone()
        if row is None:
            return None
        return QueueItem(
            id=row[0], file_path=row[1], table_name=row[2], priority=row[3],
            status=row[4], config=json.loads(row[5]) if row[5] else None,
            error=row[6], created_at=row[7], updated_at=row[8],
        )

    def list_items(self, status: str | None = None) -> list[QueueItem]:
        """All items, priority DESC then FIFO, optionally filtered by
        status (reference core/queue_manager.py:218-240)."""
        sql = (
            "SELECT id FROM queue_items{} ORDER BY priority DESC, id ASC"
        )
        if status is not None:
            status = QueueStatus(status).value  # validate
            rows = self._conn.execute(
                sql.format(" WHERE status = ?"), (status,)
            ).fetchall()
        else:
            rows = self._conn.execute(sql.format("")).fetchall()
        return [self.get(r[0]) for r in rows]

    def remove(self, item_id: int) -> bool:
        """Delete one item (reference queue_manager.py:206-216). Returns
        whether a row was actually removed."""
        n = self._conn.execute(
            "DELETE FROM queue_items WHERE id = ?", (item_id,)
        ).rowcount
        self._conn.commit()
        return bool(n)

    def clear_completed(self, keep_failed: bool = True) -> int:
        """Drop completed (and optionally failed) items (reference
        queue_manager.py:263-279). Returns the number removed."""
        statuses = [QueueStatus.COMPLETED.value]
        if not keep_failed:
            statuses.append(QueueStatus.FAILED.value)
        n = self._conn.execute(
            "DELETE FROM queue_items WHERE status IN ({})".format(
                ",".join("?" * len(statuses))
            ),
            statuses,
        ).rowcount
        self._conn.commit()
        return n

    def retry_failed(self) -> int:
        """FAILED -> PENDING with the error cleared, so the next
        process run picks them up again (reference
        queue_manager.py:281-291). Returns the number reset."""
        n = self._conn.execute(
            "UPDATE queue_items SET status = ?, error = NULL,"
            " updated_at = ? WHERE status = ?",
            (QueueStatus.PENDING.value, time.time(),
             QueueStatus.FAILED.value),
        ).rowcount
        self._conn.commit()
        return n

    def stats(self) -> dict[str, int]:
        rows = self._conn.execute(
            "SELECT status, COUNT(*) FROM queue_items GROUP BY status"
        ).fetchall()
        return {status: n for status, n in rows}

    def close(self) -> None:
        self._conn.close()


def default_item_config(file_path: str, table_name: str) -> dict:
    """Config synthesized for items enqueued without one (reference
    scripts/queue_processor.py:107-139: clean op + append storage +
    auto validation), retargeted to a parquet sink."""
    fmt = Path(file_path).suffix.lstrip(".").lower() or "csv"
    if fmt == "jsonl":
        fmt = "json"
    return {
        "name": f"queue_{table_name}",
        "source": {"type": fmt if fmt in ("csv", "json", "parquet") else "csv"},
        "input": {"path": file_path},
        "processing": {
            "operations": [
                {"type": "clean",
                 "operations": ["remove_empty_rows", "trim_strings",
                                "standardize_nulls"]},
            ]
        },
        "validation": {"enabled": True},
        "storage": {"type": "parquet", "destination": table_name,
                    "mode": "append"},
    }


class QueueProcessor:
    """Claims items and runs each through core.Pipeline (reference
    scripts/queue_processor.py:49-105; continuous poll :163-215)."""

    def __init__(self, queue: QueueManager, spark):
        self.queue = queue
        self.spark = spark

    def process_one(self) -> QueueItem | None:
        """Claim + run one item; returns the finished item (or None if the
        queue is empty)."""
        from .pipeline import Pipeline

        item = self.queue.next_item()
        if item is None:
            return None
        config = item.config or default_item_config(
            item.file_path, item.table_name
        )
        try:
            result = Pipeline(config, self.spark).run(
                input_source=item.file_path
            )
            if result.status == "success":
                self.queue.complete(item.id)
            else:
                self.queue.fail(item.id, result.error or result.status)
        except Exception as exc:  # noqa: BLE001
            self.queue.fail(item.id, str(exc))
        return self.queue.get(item.id)

    def process_all(self, max_items: int | None = None) -> list[QueueItem]:
        done: list[QueueItem] = []
        while max_items is None or len(done) < max_items:
            item = self.process_one()
            if item is None:
                break
            done.append(item)
        return done

    def run_continuous(self, poll_seconds: float = 30.0, max_polls: int | None = None):
        """Poll loop (reference :163-215). Bounded by max_polls for tests."""
        polls = 0
        while max_polls is None or polls < max_polls:
            self.process_all()
            polls += 1
            if max_polls is None or polls < max_polls:
                time.sleep(poll_seconds)
