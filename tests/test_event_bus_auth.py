"""Event bus (store, subscribe/publish, middleware, dead letters,
metrics bridge, Pipeline lifecycle wiring) and the auth layer
(PBKDF2 passwords, signed tokens with expiry/tamper checks, hashed
API keys, lockout, permissions, decorators)."""

from __future__ import annotations

import time

import pytest

from data_pipeline_framework_spark.architecture import (
    DomainEvent,
    EventBus,
    EventType,
    LoggingEventHandler,
    MetricsEventHandler,
)
from data_pipeline_framework_spark.observability import MetricsCollector
from data_pipeline_framework_spark.security import (
    Permission,
    Role,
    SecurityManager,
    User,
    require_permission,
    require_role,
)

SF_DIR = "/root/testdata/sf0.001"


# -- event bus -------------------------------------------------------


def _ev(t=EventType.CUSTOM, agg="p1", **payload):
    return DomainEvent(event_type=t, aggregate_id=agg, payload=payload)


def test_publish_store_and_typed_subscription():
    bus = EventBus()
    seen = []
    bus.subscribe(seen.append, event_types=[EventType.PIPELINE_COMPLETED])
    assert bus.publish(_ev(EventType.PIPELINE_STARTED)) == 0
    assert bus.publish(_ev(EventType.PIPELINE_COMPLETED)) == 1
    assert len(seen) == 1
    # store keeps everything, queryable both ways
    assert len(bus.store.all_events()) == 2
    assert len(bus.get_event_history("p1")) == 2
    assert len(bus.store.get_events_by_type(EventType.PIPELINE_STARTED)) == 1
    # round-trip serialization
    d = seen[0].to_dict()
    back = DomainEvent.from_dict(d)
    assert back.event_type is EventType.PIPELINE_COMPLETED
    assert back.event_id == seen[0].event_id


def test_dead_letter_isolation_and_middleware():
    bus = EventBus()
    calls = []

    def bad(_e):
        raise RuntimeError("handler exploded")

    bus.subscribe(bad)
    bus.subscribe(calls.append)
    mw_seen = []
    bus.add_middleware(mw_seen.append)
    delivered = bus.publish(_ev())
    assert delivered == 1          # good handler still ran
    assert len(calls) == 1
    assert len(bus.dead_letters) == 1
    assert "handler exploded" in bus.dead_letters[0][1]
    assert len(mw_seen) == 1


def test_handler_objects_and_metrics_bridge():
    bus = EventBus()
    log = LoggingEventHandler()
    coll = MetricsCollector()
    bus.subscribe(log)
    bus.subscribe(MetricsEventHandler(coll))
    bus.publish(_ev(EventType.PIPELINE_COMPLETED, agg="daily",
                    duration_sec=1.5))
    assert any("pipeline_completed" in line for line in log.lines)
    assert coll.get_aggregated_metrics(
        "events_pipeline_completed_total", "1m")["count"] == 1
    assert coll.get_aggregated_metrics(
        "pipeline_duration_seconds", "1m")["latest"] == 1.5


def test_event_store_bounded():
    from data_pipeline_framework_spark.architecture import EventStore

    store = EventStore(max_events=5)
    for i in range(10):
        store.append(_ev(agg=f"a{i}"))
    evs = store.all_events()
    assert len(evs) == 5
    assert evs[0].aggregate_id == "a5"  # oldest evicted


def test_pipeline_publishes_lifecycle_events(spark, tmp_path):
    from data_pipeline_framework_spark.core.pipeline import Pipeline

    bus = EventBus()
    cfg = {
        "name": "evt_pipeline",
        "source": {"type": "parquet"},
        "input": {"path": f"{SF_DIR}/region.parquet"},
        "processing": {"operations": [
            {"type": "select", "columns": ["r_regionkey", "r_name"]},
        ]},
        "storage": {"type": "parquet", "mode": "overwrite",
                    "destination": str(tmp_path / "out")},
    }
    result = Pipeline(cfg, spark, event_bus=bus).run()
    assert result.status == "success"
    types = [e.event_type for e in bus.get_event_history("evt_pipeline")]
    assert types == [EventType.PIPELINE_STARTED,
                     EventType.PIPELINE_COMPLETED]
    done = bus.store.get_events_by_type(EventType.PIPELINE_COMPLETED)[0]
    assert done.payload["rows_written"] == 5
    # failure path
    bad = dict(cfg, name="evt_broken",
               input={"path": str(tmp_path / "missing.parquet")})
    result = Pipeline(bad, spark, event_bus=bus).run()
    assert result.status == "failed"
    types = [e.event_type for e in bus.get_event_history("evt_broken")]
    assert types == [EventType.PIPELINE_STARTED, EventType.PIPELINE_FAILED]


# -- auth ------------------------------------------------------------


def test_password_hash_and_login_tokens():
    sm = SecurityManager(secret="test-secret")
    user = sm.create_user("ana", "ana@example.com", "s3cret-pw",
                          roles=[Role.ANALYST])
    assert user.user_id and user.active
    # wrong password, unknown user
    assert sm.authenticate_user("ana", "nope-nope") is None
    assert sm.authenticate_user("ghost", "whatever") is None
    token = sm.authenticate_user("ana", "s3cret-pw")
    assert token and token.count(".") == 2
    back = sm.verify_token(token)
    assert back is not None and back.username == "ana"
    # tampered token fails closed
    h, p, s = token.split(".")
    assert sm.verify_token(f"{h}.{p}X.{s}") is None
    assert sm.verify_token("garbage") is None
    # stored hash is salted PBKDF2, never plaintext
    stored = sm.users["ana"]["password_hash"]
    assert stored.startswith("pbkdf2$240000$") and "s3cret-pw" not in stored


def test_token_expiry_and_deactivation():
    sm = SecurityManager(secret="x", token_ttl=0.05)
    sm.create_user("bob", "b@e.com", "longenough")
    token = sm.authenticate_user("bob", "longenough")
    assert sm.verify_token(token) is not None
    time.sleep(0.1)
    assert sm.verify_token(token) is None  # expired
    sm2 = SecurityManager(secret="y")
    sm2.create_user("cat", "c@e.com", "longenough")
    t2 = sm2.authenticate_user("cat", "longenough")
    sm2.deactivate_user("cat")
    assert sm2.verify_token(t2) is None  # deactivated users fail closed


def test_login_lockout():
    sm = SecurityManager(secret="x", max_failed_attempts=3,
                         rate_window=300.0)
    sm.create_user("dora", "d@e.com", "rightpass1")
    for _ in range(3):
        assert sm.authenticate_user("dora", "wrong") is None
    # locked out now — even the RIGHT password is refused
    assert sm.authenticate_user("dora", "rightpass1") is None
    actions = [e.action for e in sm.get_security_events(
        event_type="auth")]
    assert "login_rate_limited" in actions


def test_api_keys_hashed_and_revocable():
    sm = SecurityManager(secret="x")
    sm.create_user("eng", "e@e.com", "longenough", roles=[Role.ENGINEER])
    key = sm.create_api_key("eng", "ci-bot")
    assert key.startswith("dpf_")
    assert key not in str(sm.api_keys)  # only the hash is stored
    user = sm.verify_api_key(key)
    assert user is not None and user.username == "eng"
    assert sm.verify_api_key("dpf_forged") is None
    assert sm.revoke_api_key(key) is True
    assert sm.verify_api_key(key) is None
    with pytest.raises(ValueError, match="unknown user"):
        sm.create_api_key("ghost", "x")


def test_roles_permissions_and_decorators():
    viewer = User("u1", "v", roles=[Role.VIEWER])
    admin = User("u2", "a", roles=[Role.ADMIN])
    assert viewer.has_permission(Permission.READ_DATA)
    assert not viewer.has_permission(Permission.WRITE_DATA)
    assert admin.has_permission(Permission.WRITE_DATA)  # admin implies all
    assert viewer.has_any_permission(
        [Permission.WRITE_DATA, Permission.READ_DATA])
    assert not viewer.has_all_permissions(
        [Permission.WRITE_DATA, Permission.READ_DATA])

    @require_permission(Permission.WRITE_DATA)
    def write_thing(user=None):
        return "wrote"

    @require_role(Role.ADMIN)
    def admin_thing(user=None):
        return "admined"

    assert write_thing(user=admin) == "wrote"
    with pytest.raises(PermissionError, match="write_data"):
        write_thing(user=viewer)
    with pytest.raises(PermissionError):
        write_thing()
    assert admin_thing(user=admin) == "admined"
    with pytest.raises(PermissionError, match="admin"):
        admin_thing(user=viewer)


def test_user_validation_and_encryption_gate():
    sm = SecurityManager(secret="x")
    sm.create_user("x1", "x@e.com", "longenough")
    with pytest.raises(ValueError, match="already exists"):
        sm.create_user("x1", "x@e.com", "longenough")
    with pytest.raises(ValueError, match="at least 8"):
        sm.create_user("x2", "x@e.com", "short")
    try:
        out = sm.encrypt_data("hello")
    except NotImplementedError as e:
        assert "cryptography" in str(e)
    else:  # cryptography IS available here: round-trip must hold
        assert sm.decrypt_data(out) == "hello"


def test_quality_monitor_publishes_alert_events(spark):
    from pyspark.sql import functions as F

    from data_pipeline_framework_spark.governance.quality import (
        QualityMonitor,
    )
    from data_pipeline_framework_spark.sources import read_table

    bus = EventBus()
    mon = QualityMonitor(event_bus=bus)
    # plant 50% nulls so completeness lands below critical (0.8)
    df = read_table(spark, SF_DIR, "orders").select(
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderstatus"))
        .alias("o_orderstatus")
    )
    results = mon.run_quality_checks(df, "orders_dirty", checks=[{
        "metric": "completeness", "column": "o_orderstatus",
        "warning_threshold": 0.95, "critical_threshold": 0.8,
    }])
    assert results[0].status == "FAIL"
    evs = bus.store.get_events_by_type(EventType.DATA_QUALITY_ALERT)
    assert len(evs) == 1
    assert evs[0].aggregate_id == "orders_dirty"
    assert evs[0].payload["severity"] == "critical"
    assert evs[0].payload["column"] == "o_orderstatus"
