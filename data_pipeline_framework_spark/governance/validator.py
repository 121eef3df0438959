"""Expectation-suite validation (reference utils/data_validator.py).

The reference wraps Great Expectations: suite creation with
auto-generated expectations (:60-126), per-type expectation generators
(:128-244), a validation run (:262-317), and suite save/load (:361-410).
Great Expectations is not a dependency here — the same expectation
vocabulary is implemented natively: every expectation compiles to a
violation-count aggregate and the whole suite runs in ONE `df.agg` pass
(plus one small pass for uniqueness checks), so validating a 100 TB
table costs a single scan.

Supported expectation types (GE naming):
  expect_column_to_exist
  expect_column_values_to_not_be_null
  expect_column_values_to_be_between          (min_value/max_value)
  expect_column_value_lengths_to_be_between   (min_value/max_value)
  expect_column_values_to_be_in_set           (value_set)
  expect_column_values_to_match_regex         (regex)
  expect_column_values_to_be_unique
  expect_table_row_count_to_be_between        (min_value/max_value)
Each accepts `mostly` (fraction of rows that must comply, default 1.0).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ExpectationSuite:
    name: str
    expectations: list[dict] = field(default_factory=list)

    def add(self, expectation_type: str, **kwargs) -> "ExpectationSuite":
        self.expectations.append(
            {"expectation_type": expectation_type, "kwargs": kwargs}
        )
        return self

    # -- persistence (reference :361-410) -----------------------------------

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(
            {"name": self.name, "expectations": self.expectations}, indent=2
        ))

    @classmethod
    def load(cls, path: str | Path) -> "ExpectationSuite":
        data = json.loads(Path(path).read_text())
        return cls(name=data["name"], expectations=data["expectations"])


def auto_generate_suite(
    df: DataFrame, name: str, max_set_size: int = 20
) -> ExpectationSuite:
    """Auto-expectations from observed data (reference :60-126, :128-244):
    existence + not-null (where observed) for every column; observed
    min/max bounds for numeric and timestamp columns; length bounds for
    strings; an in-set expectation for low-cardinality strings. One agg
    pass gathers every observation."""
    suite = ExpectationSuite(name)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.count(c).alias(f"{f.name}__nn"))
        if isinstance(f.dataType, T.NumericType) or isinstance(
            f.dataType, (T.TimestampType, T.DateType)
        ):
            aggs.append(F.min(c).alias(f"{f.name}__min"))
            aggs.append(F.max(c).alias(f"{f.name}__max"))
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.min(F.length(c)).alias(f"{f.name}__lmin"))
            aggs.append(F.max(F.length(c)).alias(f"{f.name}__lmax"))
            aggs.append(
                F.approx_count_distinct(c, rsd=0.02).alias(f"{f.name}__card")
            )
    obs = df.agg(*aggs).first()
    for f in df.schema.fields:
        suite.add("expect_column_to_exist", column=f.name)
        if obs[f"{f.name}__nn"] == obs["__n"]:
            suite.add("expect_column_values_to_not_be_null", column=f.name)
        if isinstance(f.dataType, T.NumericType):
            suite.add(
                "expect_column_values_to_be_between", column=f.name,
                min_value=obs[f"{f.name}__min"],
                max_value=obs[f"{f.name}__max"],
            )
        elif isinstance(f.dataType, (T.TimestampType, T.DateType)):
            suite.add(
                "expect_column_values_to_be_between", column=f.name,
                min_value=str(obs[f"{f.name}__min"]),
                max_value=str(obs[f"{f.name}__max"]),
            )
        elif isinstance(f.dataType, T.StringType):
            suite.add(
                "expect_column_value_lengths_to_be_between", column=f.name,
                min_value=obs[f"{f.name}__lmin"],
                max_value=obs[f"{f.name}__lmax"],
            )
            if (obs[f"{f.name}__card"] or 0) <= max_set_size:
                values = [
                    r[0] for r in
                    df.select(f.name).where(F.col(f.name).isNotNull())
                    .distinct().orderBy(f.name).limit(max_set_size).collect()
                ]
                suite.add(
                    "expect_column_values_to_be_in_set", column=f.name,
                    value_set=values,
                )
    return suite


def _violation_predicate(exp: dict, dtypes: dict[str, str]) -> Column | None:
    """Boolean column: True where a row VIOLATES the expectation.
    Null rows don't violate value expectations (GE semantics) except
    not_be_null itself."""
    et, kw = exp["expectation_type"], exp.get("kwargs", {})
    c = F.col(kw["column"]) if "column" in kw else None
    if et == "expect_column_values_to_not_be_null":
        return c.isNull()
    if et == "expect_column_values_to_be_between":
        lo, hi = kw.get("min_value"), kw.get("max_value")
        col = c.cast("string") if isinstance(lo, str) else c
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (col < F.lit(lo))
        if hi is not None:
            cond = cond | (col > F.lit(hi))
        return c.isNotNull() & cond
    if et == "expect_column_value_lengths_to_be_between":
        ln = F.length(c)
        cond = F.lit(False)
        if kw.get("min_value") is not None:
            cond = cond | (ln < kw["min_value"])
        if kw.get("max_value") is not None:
            cond = cond | (ln > kw["max_value"])
        return c.isNotNull() & cond
    if et == "expect_column_values_to_be_in_set":
        return c.isNotNull() & ~c.isin(list(kw["value_set"]))
    if et == "expect_column_values_to_match_regex":
        return c.isNotNull() & ~c.rlike(kw["regex"])
    return None  # handled structurally (exists / row count / unique)


def validate(df: DataFrame, suite: ExpectationSuite) -> dict:
    """Run the suite in one agg pass (+ one pass for uniqueness).

    Returns {success, statistics, results: [...]}, shaped like the
    reference's validation payload (:262-317)."""
    dtypes = dict(df.dtypes)
    results: list[dict] = []
    row_preds: list[tuple[int, dict, Column]] = []
    unique_cols: list[tuple[int, dict]] = []
    structural: list[tuple[int, dict]] = []
    for i, exp in enumerate(suite.expectations):
        et = exp["expectation_type"]
        kw = exp.get("kwargs", {})
        if et == "expect_column_to_exist" or et == "expect_table_row_count_to_be_between":
            structural.append((i, exp))
        elif et == "expect_column_values_to_be_unique":
            unique_cols.append((i, exp))
        else:
            if kw.get("column") not in dtypes:
                results.append({
                    "expectation": exp, "success": False,
                    "observed": "column missing",
                })
                continue
            pred = _violation_predicate(exp, dtypes)
            if pred is None:
                raise ValueError(f"unsupported expectation: {et!r}")
            row_preds.append((i, exp, pred))

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, _, pred in row_preds:
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"__v{i}"))
    for i, exp in unique_cols:
        col = exp["kwargs"]["column"]
        aggs.append(F.count(F.col(col)).alias(f"__cnt{i}"))
        aggs.append(F.count_distinct(F.col(col)).alias(f"__dst{i}"))
    obs = df.agg(*aggs).first()
    n = obs["__n"]

    for i, exp, _ in row_preds:
        mostly = float(exp.get("kwargs", {}).get("mostly", 1.0))
        violations = obs[f"__v{i}"] or 0
        compliant = (n - violations) / n if n else 1.0
        results.append({
            "expectation": exp, "success": compliant >= mostly,
            "observed": {"violations": int(violations),
                         "compliant_fraction": compliant},
        })
    for i, exp in unique_cols:
        ok = obs[f"__cnt{i}"] == obs[f"__dst{i}"]
        results.append({
            "expectation": exp, "success": bool(ok),
            "observed": {"values": int(obs[f"__cnt{i}"]),
                         "distinct": int(obs[f"__dst{i}"])},
        })
    for i, exp in structural:
        et = exp["expectation_type"]
        kw = exp.get("kwargs", {})
        if et == "expect_column_to_exist":
            ok = kw["column"] in dtypes
            results.append({"expectation": exp, "success": ok,
                            "observed": {"exists": ok}})
        else:  # row count between
            lo = kw.get("min_value", 0)
            hi = kw.get("max_value")
            ok = n >= lo and (hi is None or n <= hi)
            results.append({"expectation": exp, "success": ok,
                            "observed": {"row_count": int(n)}})

    n_pass = sum(1 for r in results if r["success"])
    return {
        "success": n_pass == len(results),
        "suite": suite.name,
        "statistics": {
            "evaluated": len(results), "successful": n_pass,
            "failed": len(results) - n_pass,
            "success_percent": 100.0 * n_pass / len(results) if results else 100.0,
        },
        "results": results,
    }
