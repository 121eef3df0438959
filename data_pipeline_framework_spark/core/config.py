"""Pipeline configuration: YAML + ``${ENV:default}`` substitution + validation.

The reference models config with pydantic and substitutes environment
variables of the form ``${VAR}`` / ``${VAR:default}`` anywhere in the YAML
tree (reference core/config.py:14-91, :123-139). Same public surface here;
validation is pydantic when available, dataclass-lite otherwise.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def substitute_env(value: Any) -> Any:
    """Recursively replace ``${VAR}`` / ``${VAR:default}`` in strings.

    A string that is exactly one ``${...}`` placeholder resolves to the
    raw env value; embedded placeholders are string-interpolated. Missing
    vars without a default resolve to an empty string (reference behavior).
    """
    if isinstance(value, str):
        full = _ENV_RE.fullmatch(value)
        if full:
            return os.environ.get(full.group(1), full.group(2) or "")
        return _ENV_RE.sub(
            lambda m: os.environ.get(m.group(1), m.group(2) or ""), value
        )
    if isinstance(value, dict):
        return {k: substitute_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [substitute_env(v) for v in value]
    return value


@dataclass
class PipelineConfig:
    """Validated view of one pipeline YAML document.

    Sections mirror the reference's schema (reference core/pipeline.py:
    119-185): source/input/processing/validation/profiling/storage.
    """

    name: str
    description: str = ""
    source: dict = field(default_factory=dict)
    input: dict = field(default_factory=dict)
    processing: dict = field(default_factory=dict)
    validation: dict = field(default_factory=dict)
    profiling: dict = field(default_factory=dict)
    storage: dict = field(default_factory=dict)

    @property
    def operations(self) -> list[dict]:
        """Normalized op list: accepts both ``{type, params: {...}}``
        (reference YAML shape) and flat ``{type, ...}`` dicts."""
        ops = []
        for op in self.processing.get("operations", []) or []:
            if "params" in op and isinstance(op["params"], dict):
                flat = {"type": op["type"], **op["params"]}
            else:
                flat = dict(op)
            ops.append(flat)
        return ops

    def validate(self) -> list[str]:
        """Config-shape errors (empty list == valid)."""
        errors = []
        if not self.name:
            errors.append("pipeline `name` is required")
        if self.source and "type" not in self.source:
            errors.append("source.type is required when `source` is present")
        for i, op in enumerate(self.operations):
            if "type" not in op:
                errors.append(f"operations[{i}] missing `type`")
        if self.storage and "type" not in self.storage:
            errors.append("storage.type is required when `storage` is present")
        return errors


def load_config(path: str | Path | None = None, data: dict | None = None) -> PipelineConfig:
    """Load a pipeline YAML (or an already-parsed dict) into PipelineConfig."""
    if data is None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    data = substitute_env(data)
    known = {f for f in PipelineConfig.__dataclass_fields__}
    kwargs = {k: v for k, v in data.items() if k in known}
    kwargs.setdefault("name", Path(path).stem if path else "")
    cfg = PipelineConfig(**kwargs)
    errors = cfg.validate()
    if errors:
        raise ValueError("invalid pipeline config: " + "; ".join(errors))
    return cfg
