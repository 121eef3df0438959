from .event_bus import (  # noqa: F401
    DomainEvent,
    EventBus,
    EventStore,
    EventType,
    LoggingEventHandler,
    MetricsEventHandler,
)
