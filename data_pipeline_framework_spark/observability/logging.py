"""Structured JSON logging with bound context — stdlib logging only.

Mirrors the reference's StructuredLogger (monitoring/
structured_logging.py:16-183: structlog-based JSON logs with
set_context/clear_context and domain helpers log_pipeline_start/end,
log_data_quality_check, log_performance_metric, log_transformation,
log_data_lineage) without the structlog dependency: a
``logging.Formatter`` that emits one JSON object per record, and a
logger wrapper that merges bound context + per-call fields.

On a cluster the driver log is frequently the ONLY artifact of a dead
run; one-JSON-per-line means it is grep-able and loadable back into
Spark/DuckDB as JSONL without a parse step.
"""

from __future__ import annotations

import json
import logging
import time

__all__ = ["JsonFormatter", "StructuredLogger"]

_RESERVED = {
    "name", "msg", "args", "levelname", "levelno", "pathname", "filename",
    "module", "exc_info", "exc_text", "stack_info", "lineno", "funcName",
    "created", "msecs", "relativeCreated", "thread", "threadName",
    "processName", "process", "taskName", "message",
}


class JsonFormatter(logging.Formatter):
    """One JSON object per record: ts/level/logger/message + every
    non-reserved extra attribute (the wrapper passes fields that way)."""

    def format(self, record: logging.LogRecord) -> str:
        doc = {
            "ts": record.created,
            "level": record.levelname.lower(),
            "logger": record.name,
            "message": record.getMessage(),
        }
        for k, v in record.__dict__.items():
            if k not in _RESERVED and not k.startswith("_"):
                try:
                    json.dumps(v)
                    doc[k] = v
                except (TypeError, ValueError):
                    doc[k] = repr(v)
        if record.exc_info and record.exc_info[1] is not None:
            doc["exception"] = repr(record.exc_info[1])
        return json.dumps(doc, sort_keys=True)


class StructuredLogger:
    """``logging`` wrapper with bound context and pipeline-domain
    helpers; every line is one JSON object."""

    def __init__(self, name: str, stream=None, level: int = logging.INFO):
        self._logger = logging.getLogger(name)
        self._logger.setLevel(level)
        self._logger.propagate = False
        handler = logging.StreamHandler(stream)
        handler.setFormatter(JsonFormatter())
        # replace handlers so repeated construction never double-logs
        self._logger.handlers = [handler]
        self._context: dict = {}

    def set_context(self, **kwargs) -> None:
        self._context.update(kwargs)

    def clear_context(self) -> None:
        self._context.clear()

    def _log(self, level: int, message: str, **fields) -> None:
        self._logger.log(level, message, extra={**self._context, **fields})

    def debug(self, message: str, **kw) -> None:
        self._log(logging.DEBUG, message, **kw)

    def info(self, message: str, **kw) -> None:
        self._log(logging.INFO, message, **kw)

    def warning(self, message: str, **kw) -> None:
        self._log(logging.WARNING, message, **kw)

    def error(self, message: str, **kw) -> None:
        self._log(logging.ERROR, message, **kw)

    def critical(self, message: str, **kw) -> None:
        self._log(logging.CRITICAL, message, **kw)

    def exception(self, message: str, **kw) -> None:
        self._logger.error(
            message, exc_info=True, extra={**self._context, **kw}
        )

    # -- domain helpers (reference :97-183) ---------------------------

    def log_pipeline_start(self, pipeline_name: str, config: dict) -> None:
        self.info("pipeline started", event="pipeline_start",
                  pipeline=pipeline_name,
                  operations=len(
                      (config.get("processing") or {}).get("operations", [])
                  ))

    def log_pipeline_end(self, pipeline_name: str, status: str,
                         duration_seconds: float,
                         rows_processed: int | None = None) -> None:
        self.info("pipeline finished", event="pipeline_end",
                  pipeline=pipeline_name, status=status,
                  duration_seconds=duration_seconds,
                  rows_processed=rows_processed)

    def log_data_quality_check(self, table_name: str, metric_name: str,
                               value: float, passed: bool) -> None:
        level = logging.INFO if passed else logging.WARNING
        self._log(level, "data quality check", event="quality_check",
                  table=table_name, metric=metric_name, value=value,
                  passed=passed)

    def log_performance_metric(self, operation: str,
                               duration_seconds: float, **fields) -> None:
        self.info("performance metric", event="performance",
                  operation=operation, duration_seconds=duration_seconds,
                  **fields)

    def log_transformation(self, transformation_type: str,
                           input_records: int, output_records: int) -> None:
        self.info("transformation applied", event="transformation",
                  transformation=transformation_type,
                  input_records=input_records,
                  output_records=output_records)

    def log_data_lineage(self, source_table: str, target_table: str,
                         operation: str) -> None:
        self.info("lineage edge", event="lineage", source=source_table,
                  target=target_table, operation=operation)

    def timed(self, operation: str, **fields):
        """Context manager: logs a performance metric on exit."""
        logger = self

        class _Timed:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                logger.log_performance_metric(
                    operation, time.time() - self.t0, **fields
                )
                return False

        return _Timed()
