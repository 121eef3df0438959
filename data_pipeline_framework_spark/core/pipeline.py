"""Pipeline: the reference's six-stage lifecycle compiled onto one Spark plan.

Reference lifecycle (reference core/pipeline.py:187-285, SURVEY.md §3.1):
load -> profile -> infer schema -> process(operations) -> validate -> write.
The reference runs these as eager pandas stages; here the operation list
compiles to ONE lazy DataFrame chain (plans/compiler.py) and profiling /
validation are additional lazy aggregation plans over the same DataFrame —
persisted once when more than one action will touch it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.compiler import compile_ops
from ..sources import readers
from ..sinks.writers import write_output
from ..functions.profiling import profile_columns, quality_metrics
from .config import PipelineConfig, load_config


@dataclass
class PipelineResult:
    """Run outcome (reference returns a status dict; core/pipeline.py:275-285)."""

    status: str  # success | validation_failed | failed
    pipeline: str
    rows_written: int | None = None
    duration_sec: float = 0.0
    validation: list[dict] = field(default_factory=list)
    profile: list[dict] = field(default_factory=list)
    storage: dict = field(default_factory=dict)
    error: str | None = None


class Pipeline:
    """Config-driven pipeline: YAML -> compiled lazy plan -> sink.

    Usage::

        Pipeline.from_yaml("pipeline.yaml", spark).run()
        Pipeline(cfg, spark, tables={"orders": df}).run(input_df=lineitem)
    """

    def __init__(
        self,
        config: PipelineConfig | dict,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        lineage=None,
        event_bus=None,
    ):
        if isinstance(config, dict):
            config = load_config(data=config)
        self.config = config
        self.spark = spark
        self.tables = tables or {}
        self.lineage = lineage  # governance.LineageTracker or None
        self.event_bus = event_bus  # architecture.EventBus or None
        self._joined_tables: list[str] = [
            op.get("right") for op in config.operations
            if op.get("type") == "join" and isinstance(op.get("right"), str)
        ]

    @classmethod
    def from_yaml(
        cls,
        path: str | Path,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
    ) -> "Pipeline":
        return cls(load_config(path), spark, tables)

    def get_pipeline_info(self) -> dict:
        """Summary of the parsed config (reference core/pipeline.py
        get_pipeline_info, surfaced by `cli info` :293-313)."""
        c = self.config
        return {
            "name": c.name,
            "description": c.description,
            "source_type": c.source.get("type", "parquet"),
            "processing_engine": "spark",
            "storage_type": c.storage.get("type", "none"),
            "total_operations": len(c.operations),
            "validation_enabled": bool(c.validation.get("enabled")),
            "profiling_enabled": bool(c.profiling.get("enabled")),
            "joined_tables": list(self._joined_tables),
        }

    # -- stage 1: load ------------------------------------------------------

    def load(self, input_source: str | None = None) -> DataFrame:
        """Source dispatch (reference PipelineFactory :22-34 + _load_data
        :287-305). `input_source` overrides the configured path (the CLI's
        --input flag, reference cli/main.py:41-94)."""
        src = self.config.source
        stype = src.get("type", "parquet")
        cfg = dict(src.get("config") or {})
        inp = self.config.input
        path = input_source or inp.get("path") or cfg.get("path")
        if not path and cfg.get("base_path") and inp.get("file_pattern"):
            path = str(Path(cfg["base_path"]) / inp["file_pattern"])
        if stype == "csv":
            return readers.read_csv(
                self.spark, path,
                sep=cfg.get("delimiter", ","),
                encoding=cfg.get("encoding", "utf-8"),
                source_file_column=cfg.get("source_file_column", False),
            )
        if stype in ("json", "jsonl", "s3"):
            fmt = inp.get("format", "json" if stype != "s3" else "parquet")
            if stype == "s3" and not str(path).startswith("s3a://"):
                path = f"s3a://{cfg['bucket']}/{cfg.get('prefix', '')}/{inp.get('file_pattern', '*')}"
            if fmt in ("json", "jsonl"):
                return readers.read_json(
                    self.spark, path, multiline=(fmt == "json" and cfg.get("multiline", False))
                )
            if fmt == "csv":
                return readers.read_csv(self.spark, path)
            return readers.read_parquet(self.spark, path)
        if stype == "parquet":
            nanos = tuple(cfg.get("nanos_ts_columns") or ())
            prune = cfg.get("prune")
            if prune:
                # footer-stats file skipping: [[column, op, value], ...]
                from ..sources.pruning import read_parquet_pruned

                return read_parquet_pruned(
                    self.spark, path,
                    [tuple(p) for p in prune],
                    nanos_ts_columns=nanos,
                    source_file_column=cfg.get("source_file_column", False),
                )
            return readers.read_parquet(
                self.spark, path,
                nanos_ts_columns=nanos,
                source_file_column=cfg.get("source_file_column", False),
            )
        if stype in ("jdbc", "postgresql"):
            props = dict(cfg.get("properties") or {})
            table = cfg.get("table") or cfg.get("query")
            return self.spark.read.jdbc(cfg["url"], table, properties=props)
        raise ValueError(f"unknown source type: {stype!r}")

    # -- stage 4: process ---------------------------------------------------

    def process(self, df: DataFrame) -> DataFrame:
        def resolve(name: str) -> DataFrame:
            if name in self.tables:
                return self.tables[name]
            return self.spark.table(name)

        return compile_ops(self.config.operations, resolve)(df)

    # -- stage 5: validate --------------------------------------------------

    def _validation_rules(self, df: DataFrame) -> list[dict]:
        """Explicit rules, else auto-generated expectations per column
        (reference data_validator.py:60-126 auto-generates completeness /
        type expectations from the frame)."""
        rules = self.config.validation.get("rules")
        if rules:
            return list(rules)
        auto: list[dict] = []
        for f in df.schema.fields[:20]:
            auto.append({"metric": "completeness", "column": f.name,
                         "threshold": 0.9})
        return auto

    def validate(self, df: DataFrame) -> tuple[bool, list[dict]]:
        rules = self._validation_rules(df)
        if not rules:
            return True, []
        metric_rows = quality_metrics(
            df, [{k: v for k, v in r.items() if k != "threshold"} for r in rules]
        ).collect()
        results, passed = [], True
        for rule, row in zip(rules, metric_rows):
            threshold = float(rule.get("threshold", 0.0))
            value = row["value"] if row["value"] is not None else 0.0
            ok = value >= threshold
            passed &= ok
            results.append(
                {"metric": row["metric"], "column": row["column"],
                 "value": value, "threshold": threshold,
                 "status": "PASS" if ok else "FAIL"}
            )
        return passed, results

    # -- full run -----------------------------------------------------------

    def _publish(self, event_type_name: str, payload: dict) -> None:
        """Best-effort lifecycle event to the optional bus — operational
        hooks must never fail the pipeline itself."""
        if self.event_bus is None:
            return
        try:
            from ..architecture.event_bus import DomainEvent, EventType

            self.event_bus.publish(DomainEvent(
                event_type=EventType[event_type_name],
                aggregate_id=self.config.name,
                payload=payload,
            ))
        except Exception:
            pass

    def run(
        self,
        input_source: str | None = None,
        input_df: DataFrame | None = None,
        dry_run: bool = False,
    ) -> PipelineResult:
        """Execute the lifecycle; publishes PIPELINE_STARTED /
        PIPELINE_COMPLETED / PIPELINE_FAILED (+ DATA_VALIDATED when
        validation ran) on the optional event bus (reference publishes
        the same lifecycle events through its orchestrator,
        architecture/event_bus.py:62-93)."""
        self._publish("PIPELINE_STARTED", {
            "input": input_source or self.config.input.get("path"),
            "dry_run": dry_run,
        })
        result = self._run(input_source, input_df, dry_run)
        if result.validation:
            self._publish("DATA_VALIDATED", {
                "passed": result.status != "validation_failed",
                "rules": len(result.validation),
            })
        if result.status == "success":
            self._publish("PIPELINE_COMPLETED", {
                "duration_sec": result.duration_sec,
                "rows_written": result.rows_written,
            })
        else:
            self._publish("PIPELINE_FAILED", {
                "status": result.status,
                "error": result.error,
                "duration_sec": result.duration_sec,
            })
        return result

    def _run(
        self,
        input_source: str | None = None,
        input_df: DataFrame | None = None,
        dry_run: bool = False,
    ) -> PipelineResult:
        t0 = time.monotonic()
        name = self.config.name
        try:
            df = input_df if input_df is not None else self.load(input_source)
            result_df = self.process(df)

            profiling_on = self.config.profiling.get("enabled", False)
            validation_on = self.config.validation.get("enabled", False)
            writing = bool(self.config.storage) and not dry_run
            # >1 action on the same plan -> persist once (SURVEY §3.1 note)
            actions = sum((profiling_on, validation_on, writing))
            if actions > 1:
                result_df = result_df.persist()

            profile_rows: list[dict] = []
            if profiling_on:
                numeric = [
                    f.name for f in result_df.schema.fields
                    if isinstance(f.dataType, T.NumericType)
                ][:10]
                if numeric:
                    profile_rows = [
                        r.asDict() for r in
                        profile_columns(result_df, numeric).collect()
                    ]

            validation_rows: list[dict] = []
            if validation_on:
                ok, validation_rows = self.validate(result_df)
                if not ok:
                    return PipelineResult(
                        status="validation_failed", pipeline=name,
                        duration_sec=time.monotonic() - t0,
                        validation=validation_rows, profile=profile_rows,
                    )

            rows = None
            storage_meta: dict = {}
            if writing:
                stype = self.config.storage.get("type", "parquet")
                if stype in ("none", "noop"):
                    # no write action runs -> an Observation would block
                    storage_meta = write_output(result_df, self.config.storage)
                else:
                    # rows_written rides the write action itself
                    # (CollectMetrics) — a separate count() would be a
                    # second full pass over the result at corpus scale
                    obs = Observation()
                    observed = result_df.observe(
                        obs, F.count(F.lit(1)).alias("rows")
                    )
                    storage_meta = write_output(observed, self.config.storage)
                    rows = obs.get["rows"]

            if self.lineage is not None:
                source_name = (
                    input_source
                    or self.config.input.get("path")
                    or self.config.source.get("type", "input")
                )
                target = (
                    self.config.storage.get("destination")
                    or self.config.storage.get("path")
                    or name
                )
                self.lineage.track(
                    [str(source_name), *self._joined_tables], str(target),
                    operation="pipeline",
                    metadata={"pipeline": name,
                              "operations": [op["type"] for op in
                                             self.config.operations]},
                )

            return PipelineResult(
                status="success", pipeline=name, rows_written=rows,
                duration_sec=time.monotonic() - t0,
                validation=validation_rows, profile=profile_rows,
                storage=storage_meta,
            )
        except Exception as exc:  # noqa: BLE001 - reference reports, not raises
            return PipelineResult(
                status="failed", pipeline=name,
                duration_sec=time.monotonic() - t0, error=str(exc),
            )
