"""Quality monitoring loop: checks -> metrics -> thresholds -> alerts.

Parity with reference utils/quality_monitor.py: `run_quality_checks`
(:158-200), default-check synthesis per column (:202-241), PASS/WARN/FAIL
against warning/critical thresholds (:269-276), alert records (:318-432),
and a summary dashboard query (:434-527). The metric math itself is the
single-pass Spark agg in functions/profiling.quality_metrics — one scan
per table per run, whatever the table size.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.profiling import quality_metrics


@dataclass
class QualityCheckResult:
    table: str
    metric: str
    column: str
    value: float
    warning_threshold: float
    critical_threshold: float
    status: str  # PASS | WARN | FAIL
    checked_at: float = 0.0


@dataclass
class QualityAlert:
    table: str
    metric: str
    column: str
    severity: str  # warning | critical
    message: str
    created_at: float = 0.0


class QualityMonitor:
    """Threshold semantics (reference quality_monitor.py:269-276):
    value >= warning_threshold -> PASS; >= critical_threshold -> WARN;
    below critical -> FAIL. All metrics are ratios in [0, 1] where higher
    is better."""

    def __init__(self, event_bus=None) -> None:
        self.results: list[QualityCheckResult] = []
        self.alerts: list[QualityAlert] = []
        # architecture.EventBus: non-PASS checks publish
        # DATA_QUALITY_ALERT so operational hooks (paging, the web
        # /api/events feed) see them without polling the monitor
        self.event_bus = event_bus

    # -- check synthesis ----------------------------------------------------

    @staticmethod
    def default_checks(df: DataFrame, max_columns: int = 50) -> list[dict]:
        """Auto-generate per-column checks (reference :202-241): completeness
        everywhere; uniqueness on likely-key columns (name ends with _id /
        key or equals 'id'); outlier_ratio is NOT auto-added (opt-in)."""
        checks: list[dict] = []
        for f in df.schema.fields[:max_columns]:
            checks.append({
                "metric": "completeness", "column": f.name,
                "warning_threshold": 0.95, "critical_threshold": 0.8,
            })
            lname = f.name.lower()
            if (lname == "id" or lname.endswith(("_id", "key"))) and isinstance(
                f.dataType, (T.IntegralType, T.StringType)
            ):
                checks.append({
                    "metric": "uniqueness", "column": f.name,
                    "warning_threshold": 0.99, "critical_threshold": 0.9,
                })
        return checks

    # -- run ----------------------------------------------------------------

    def run_quality_checks(
        self,
        df: DataFrame,
        table: str,
        checks: list[dict] | None = None,
    ) -> list[QualityCheckResult]:
        """Execute checks in one agg pass (reference :158-200)."""
        checks = checks if checks is not None else self.default_checks(df)
        if not checks:
            return []
        rules = [
            {k: v for k, v in c.items()
             if k in ("metric", "column", "predicate", "method", "threshold")}
            for c in checks
        ]
        rows = quality_metrics(df, rules).collect()
        now = time.time()
        out: list[QualityCheckResult] = []
        for check, row in zip(checks, rows):
            warn = float(check.get("warning_threshold", 0.95))
            crit = float(check.get("critical_threshold", 0.8))
            value = float(row["value"]) if row["value"] is not None else 0.0
            if value >= warn:
                status = "PASS"
            elif value >= crit:
                status = "WARN"
            else:
                status = "FAIL"
            result = QualityCheckResult(
                table=table, metric=row["metric"], column=row["column"],
                value=value, warning_threshold=warn, critical_threshold=crit,
                status=status, checked_at=now,
            )
            out.append(result)
            if status != "PASS":
                severity = "warning" if status == "WARN" else "critical"
                alert = QualityAlert(
                    table=table, metric=result.metric, column=result.column,
                    severity=severity,
                    message=(
                        f"{result.metric}({result.column}) = {value:.4f} "
                        f"below {'warning' if status == 'WARN' else 'critical'}"
                        f" threshold on {table}"
                    ),
                    created_at=now,
                )
                self.alerts.append(alert)
                if self.event_bus is not None:
                    try:
                        from ..architecture.event_bus import (
                            DomainEvent, EventType,
                        )

                        self.event_bus.publish(DomainEvent(
                            event_type=EventType.DATA_QUALITY_ALERT,
                            aggregate_id=table,
                            payload={
                                "metric": alert.metric,
                                "column": alert.column,
                                "severity": alert.severity,
                                "value": value,
                            },
                        ))
                    except Exception:
                        pass  # alerting must never fail the check run
        self.results.extend(out)
        return out

    # -- reporting ----------------------------------------------------------

    def summary(self) -> dict:
        """Dashboard rollup (reference :434-527)."""
        by_status: dict[str, int] = {"PASS": 0, "WARN": 0, "FAIL": 0}
        for r in self.results:
            by_status[r.status] = by_status.get(r.status, 0) + 1
        return {
            "total_checks": len(self.results),
            "by_status": by_status,
            "open_alerts": len(self.alerts),
            "tables": sorted({r.table for r in self.results}),
        }

    def to_rows(self) -> list[dict]:
        """Rows shaped for the data_quality.quality_metrics table
        (reference sql/init.sql:26-35)."""
        return [
            {"table_name": r.table, "metric_name": r.metric,
             "column_name": r.column, "metric_value": r.value,
             "status": r.status, "checked_at": r.checked_at}
            for r in self.results
        ]
