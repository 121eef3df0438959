"""Plan auditor: the engine's scale-killer checks as a product surface.

The test suite lints every registered driver query for plans that
won't survive a 100x scale-up (tests/test_plan_lint.py); this module
exposes the same rules to users so ANY pipeline can be audited before
it ships — `audit_plan(df)` for findings, `assert_scalable(df)` as a
CI gate. Rules are string checks over the physical plan, which is
exactly what a human reviewer greps `.explain()` output for.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["Finding", "audit_plan", "assert_scalable"]


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "fatal" | "warn"
    detail: str


def _plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame, plan: str | None = None) -> list[Finding]:
    """Inspect a DataFrame's physical plan for shapes that stop scaling:

    - cartesian-product: O(n*m) row explosion; no key distribution
      survives it.
    - broadcast-nested-loop: non-equi join fallback — fine ONLY for a
      broadcast 1-row scalar; fatal when the broadcast side can grow.
    - row-python-udf: BatchEvalPython ships rows to Python one at a
      time; 10-100x slower than Arrow-batched pandas UDFs.
    - single-partition-window: a window/sort with no PARTITION BY
      funnels every row through one task.
    - vectorized-python: ArrowEvalPython / MapInPandas /
      FlatMapGroupsInPandas — the sanctioned escape hatch, but worth a
      warn so hot relational paths don't silently pick it up.
    """
    p = plan if plan is not None else _plan_str(df)
    found: list[Finding] = []
    if "CartesianProduct" in p:
        found.append(Finding(
            "cartesian-product", "fatal",
            "CartesianProduct in plan: O(n*m) join with no equi keys",
        ))
    if "BroadcastNestedLoopJoin" in p:
        found.append(Finding(
            "broadcast-nested-loop", "warn",
            "BroadcastNestedLoopJoin: acceptable only for broadcast "
            "1-row scalars; fatal if the broadcast side grows with data",
        ))
    if "BatchEvalPython" in p:
        found.append(Finding(
            "row-python-udf", "fatal",
            "row-at-a-time Python UDF (BatchEvalPython): use built-in "
            "functions or an Arrow-batched pandas UDF",
        ))
    # A window/sort funnels through one task only when the Exchange
    # SinglePartition feeds a Sort/Window directly (parent within the
    # plan tree) — NOT merely because both a keyed Window and a bounded
    # 1-row global aggregate (which also prints Exchange SinglePartition)
    # appear somewhere in the same plan.
    lines = p.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            parents = " ".join(lines[max(0, i - 2):i])
            if re.search(r"\b(Window|Sort)\b", parents):
                found.append(Finding(
                    "single-partition-window", "warn",
                    "window/sort over SinglePartition: every row funnels "
                    "through one task; add PARTITION BY or pre-bucket",
                ))
                break
    for marker in ("ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        if marker in p:
            found.append(Finding(
                "vectorized-python", "warn",
                f"{marker}: Arrow-batched Python stage — sanctioned "
                "escape hatch, keep it off hot relational paths",
            ))
            break
    if _lambda_contains_producer(p):
        found.append(Finding(
            "hof-inlined-producer", "warn",
            "a higher-order-function lambda body contains an array/"
            "string PRODUCER (transform/split/sequence): CollapseProject"
            " inlined the producing projection into the lambda, so it "
            "re-evaluates once PER ELEMENT — O(n^2) work per row in the "
            "interpreted HOF path. Bind the producer so it is referenced"
            " >=2 times, or restructure so lambdas only see arrays in "
            "argument position (zip_with over shifted copies).",
        ))
    return found


_PRODUCERS = ("transform(sequence(", "split(", "aggregate(")


def _lambda_contains_producer(plan: str) -> bool:
    """True when any lambdafunction(...) BODY embeds a producer-class
    expression (per-element re-evaluation hazard). Paren-walk each
    lambda to its extent; cheap string scan, no plan parsing."""
    i = 0
    while True:
        i = plan.find("lambdafunction(", i)
        if i < 0:
            return False
        j = i + len("lambdafunction(")
        depth, end = 1, len(plan)
        while j < end and depth:
            c = plan[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        body = plan[i + len("lambdafunction("):j]
        if any(m in body for m in _PRODUCERS):
            return True
        i = j


def assert_scalable(
    df: DataFrame,
    allow: set[str] | None = None,
    warn_ok: bool = True,
) -> None:
    """Raise AssertionError when the plan carries scale-killers.
    `allow` skips named rules (e.g. {"broadcast-nested-loop"} for a
    deliberate 1-row scalar); `warn_ok=False` also fails on warns."""
    allow = allow or set()
    bad = [
        f for f in audit_plan(df)
        if f.rule not in allow
        and (f.severity == "fatal" or not warn_ok)
    ]
    if bad:
        raise AssertionError(
            "plan fails scale audit:\n"
            + "\n".join(f"- [{f.severity}] {f.rule}: {f.detail}" for f in bad)
        )
