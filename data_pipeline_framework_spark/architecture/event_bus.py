"""In-process domain event bus with an append-only event store.

Mirrors the reference's event-driven layer (architecture/event_bus.py:
16-243: DomainEvent + EventType, EventStore keyed by aggregate,
EventBus with subscribe/middleware/publish, logging and metrics
handlers) minus its asyncio plumbing: the driver program of a Spark
pipeline is synchronous, so delivery here is synchronous and
thread-safe, with per-handler error isolation (one failing handler
never blocks the others — its event lands on the dead-letter list
instead).

``core.Pipeline`` publishes PIPELINE_STARTED / PIPELINE_COMPLETED /
PIPELINE_FAILED around ``run()`` when constructed with an
``event_bus=``, so operational hooks (audit trails, notification
fan-out, the metrics bridge below) attach without touching pipeline
code.
"""

from __future__ import annotations

import threading
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum


class EventType(Enum):
    PIPELINE_STARTED = "pipeline_started"
    PIPELINE_COMPLETED = "pipeline_completed"
    PIPELINE_FAILED = "pipeline_failed"
    DATA_VALIDATED = "data_validated"
    DATA_QUALITY_ALERT = "data_quality_alert"
    SCHEMA_CHANGED = "schema_changed"
    CUSTOM = "custom"


@dataclass
class DomainEvent:
    event_type: EventType
    aggregate_id: str
    payload: dict = field(default_factory=dict)
    event_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    timestamp: float = field(default_factory=time.time)

    def to_dict(self) -> dict:
        return {
            "event_type": self.event_type.value,
            "aggregate_id": self.aggregate_id,
            "payload": dict(self.payload),
            "event_id": self.event_id,
            "timestamp": self.timestamp,
        }

    @classmethod
    def from_dict(cls, data: dict) -> "DomainEvent":
        return cls(
            event_type=EventType(data["event_type"]),
            aggregate_id=data["aggregate_id"],
            payload=dict(data.get("payload") or {}),
            event_id=data.get("event_id", uuid.uuid4().hex),
            timestamp=data.get("timestamp", time.time()),
        )


class EventStore:
    """Append-only, thread-safe, bounded event log queryable by
    aggregate and by type (reference EventStore,
    architecture/event_bus.py:111-132)."""

    def __init__(self, max_events: int = 10_000):
        self._events: list[DomainEvent] = []
        self._lock = threading.Lock()
        self._max = int(max_events)

    def append(self, event: DomainEvent) -> None:
        with self._lock:
            self._events.append(event)
            if len(self._events) > self._max:
                del self._events[: len(self._events) - self._max]

    def get_events(self, aggregate_id: str) -> list[DomainEvent]:
        with self._lock:
            return [e for e in self._events
                    if e.aggregate_id == aggregate_id]

    def get_events_by_type(self, event_type: EventType) -> list[DomainEvent]:
        with self._lock:
            return [e for e in self._events if e.event_type == event_type]

    def all_events(self) -> list[DomainEvent]:
        with self._lock:
            return list(self._events)


class EventBus:
    """subscribe/publish with middleware and dead-letter isolation
    (reference EventBus, architecture/event_bus.py:135-178).

    Handlers are callables or objects with ``handle(event)`` +
    ``handled_events() -> list[EventType]``; plain callables subscribe
    to explicit types (or all types when none given).
    """

    def __init__(self, event_store: EventStore | None = None):
        self.store = event_store or EventStore()
        self._handlers: dict[EventType | None, list[Callable]] = {}
        self._middleware: list[Callable[[DomainEvent], None]] = []
        self.dead_letters: list[tuple[DomainEvent, str]] = []
        self._lock = threading.Lock()

    def subscribe(self, handler, event_types=None) -> None:
        if hasattr(handler, "handle") and hasattr(handler, "handled_events"):
            types = handler.handled_events()
            fn = handler.handle
        else:
            types = event_types
            fn = handler
        with self._lock:
            if not types:
                self._handlers.setdefault(None, []).append(fn)
            else:
                for t in types:
                    self._handlers.setdefault(t, []).append(fn)

    def add_middleware(self, middleware: Callable[[DomainEvent], None]) -> None:
        self._middleware.append(middleware)

    def publish(self, event: DomainEvent) -> int:
        """Store, run middleware, deliver to matching handlers; returns
        the number of successful deliveries. A raising handler adds a
        (event, error) dead letter and delivery continues."""
        self.store.append(event)
        for mw in self._middleware:
            mw(event)
        with self._lock:
            targets = list(self._handlers.get(event.event_type, [])) + \
                list(self._handlers.get(None, []))
        delivered = 0
        for fn in targets:
            try:
                fn(event)
                delivered += 1
            except Exception as e:
                self.dead_letters.append((event, str(e)))
        return delivered

    def get_event_history(self, aggregate_id: str) -> list[DomainEvent]:
        return self.store.get_events(aggregate_id)


class LoggingEventHandler:
    """Collects human-readable lines (reference LoggingEventHandler,
    architecture/event_bus.py:180-189); inject ``sink`` to forward to a
    real logger."""

    def __init__(self, sink: Callable[[str], None] | None = None):
        self.lines: list[str] = []
        self._sink = sink

    def handled_events(self) -> list[EventType]:
        return []  # empty -> all types

    def handle(self, event: DomainEvent) -> None:
        line = (f"[{event.event_type.value}] {event.aggregate_id} "
                f"{event.payload}")
        self.lines.append(line)
        if self._sink is not None:
            self._sink(line)


class MetricsEventHandler:
    """Bridges events into the observability collector (reference
    MetricsEventHandler, architecture/event_bus.py:191-243): one counter
    per event type, pipeline duration histograms on completion."""

    def __init__(self, collector):
        self._collector = collector

    def handled_events(self) -> list[EventType]:
        return []

    def handle(self, event: DomainEvent) -> None:
        tags = {"aggregate": event.aggregate_id}
        self._collector.record_counter(
            f"events_{event.event_type.value}_total", tags=tags
        )
        if event.event_type is EventType.PIPELINE_COMPLETED:
            dur = event.payload.get("duration_sec")
            if dur is not None:
                self._collector.record_histogram(
                    "pipeline_duration_seconds", float(dur), tags=tags
                )
