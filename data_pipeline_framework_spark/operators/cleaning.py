"""Cleaning operators (reference utils/data_cleaner.py + the `clean` op).

Everything is column-expression based — the reference's row-wise Python
loops (phone standardization iterated df[column].items(),
data_cleaner.py:134-154) become regexp expressions that run inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference data_cleaner.py:266-272 common typo map
EMAIL_DOMAIN_FIXES = {
    "gmial.com": "gmail.com",
    "gmai.com": "gmail.com",
    "yahooo.com": "yahoo.com",
    "hotmial.com": "hotmail.com",
}

EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def standardize_phone_numbers(
    df: DataFrame, column: str, output_format: str = "(XXX) XXX-XXXX"
) -> DataFrame:
    """Canonicalize US-style phone numbers (reference data_cleaner.py:116-168):
    strip non-digits, drop a leading '1' on 11-digit numbers, reformat
    10-digit numbers as (XXX) XXX-XXXX; anything else -> NULL."""
    digits = F.regexp_replace(F.col(column).cast("string"), r"[^0-9]", "")
    digits = F.when(
        (F.length(digits) == 11) & digits.startswith("1"), digits.substr(2, 10)
    ).otherwise(digits)
    formatted = F.concat(
        F.lit("("), digits.substr(1, 3), F.lit(") "),
        digits.substr(4, 3), F.lit("-"), digits.substr(7, 4),
    )
    return df.withColumn(
        column, F.when(F.length(digits) == 10, formatted).otherwise(F.lit(None))
    )


def email_valid(column: str) -> Column:
    return F.col(column).rlike(EMAIL_RE)


def validate_emails(
    df: DataFrame, column: str, strategy: str = "flag"
) -> DataFrame:
    """strategies (reference data_cleaner.py:170-228): 'flag' adds
    `{col}_valid`; 'remove' drops invalid rows; 'fix_common' repairs known
    domain typos first, then flags."""
    if strategy == "flag":
        return df.withColumn(f"{column}_valid", email_valid(column))
    if strategy == "remove":
        return df.filter(email_valid(column))
    if strategy == "fix_common":
        fixed = F.col(column)
        for typo, good in EMAIL_DOMAIN_FIXES.items():
            fixed = F.regexp_replace(
                fixed, "@" + typo.replace(".", r"\.") + "$", "@" + good
            )
        out = df.withColumn(column, fixed)
        return out.withColumn(f"{column}_valid", email_valid(column))
    raise ValueError(f"unsupported email strategy: {strategy!r}")


def remove_duplicates(
    df: DataFrame,
    subset: list[str] | None = None,
    keep: str = "first",
    order_by: list[str] | None = None,
) -> DataFrame:
    """reference data_cleaner.py:230-258 — delegates to the compiler op."""
    from ..plans.compiler import _op_deduplicate

    return _op_deduplicate(
        {"subset": subset, "keep": keep, "order_by": order_by}, None
    )(df)


def fix_missing_values(
    df: DataFrame,
    strategies: dict[str, dict],
) -> DataFrame:
    """Per-column missing-value strategy map (reference data_cleaner.py:40-114):
    {'col': {'method': 'drop'|'value'|'mean'|'median'|'mode'|'ffill'|'bfill',
             ...params}}."""
    from ..plans.compiler import _fill_null

    for col, spec in strategies.items():
        method = spec.get("method", "value")
        if method == "drop":
            df = df.na.drop(subset=[col])
        else:
            df = _fill_null(df, {"columns": [col], **spec})
    return df


class CleaningResult:
    """Audit record for one cleaning step (reference data_cleaner.py:13-21)."""

    def __init__(self, operation: str, column: str | None,
                 rows_before: int, rows_after: int, values_changed: int):
        self.operation = operation
        self.column = column
        self.rows_before = rows_before
        self.rows_after = rows_after
        self.values_changed = values_changed

    def as_dict(self) -> dict:
        return {
            "operation": self.operation, "column": self.column,
            "rows_before": self.rows_before, "rows_after": self.rows_after,
            "values_changed": self.values_changed,
        }


def clean_dataset(
    df: DataFrame,
    config: list[dict],
) -> tuple[DataFrame, list[CleaningResult]]:
    """Config-driven cleaning composition with audit records (reference
    data_cleaner.py:291-329). Each step is `{operation, ...params}`:

      remove_duplicates  (subset, keep, order_by)
      fix_missing        (strategies: {col: {method, ...}})
      standardize_phones (column)
      validate_emails    (column, strategy)
      drop_rows_where    (condition)

    Audit counting design: SINGLE-ACTION. Every row count and
    value-change count is threaded through the plan as an `Observation`
    (CollectMetrics) at the right point in the chain, and ONE terminal
    count() materializes them all — a k-step audited clean scans the
    input once, not ~k times (the quadratic re-scan the per-step
    count() shape costs at 100 TB). The returned DataFrame is the lazy
    cleaned plan; persist it if you will act on it more than once.
    """
    from pyspark.sql import Observation

    if not config:
        return df, []

    _ROWS = F.count(F.lit(1)).alias("rows")
    obs_points: list[tuple[Observation, ...]] = []

    obs_in = Observation("clean_in")
    df = df.observe(obs_in, _ROWS)

    step_meta: list[tuple[str, str | None, Observation, str | None]] = []
    for i, step in enumerate(config):
        op = step.get("operation")
        changed_metric = None  # alias of the changed metric, if any
        if op == "remove_duplicates":
            df = remove_duplicates(
                df, subset=step.get("subset"), keep=step.get("keep", "any"),
                order_by=step.get("order_by"),
            )
            column = ",".join(step.get("subset") or [])
            obs = Observation(f"clean_{i}")
            df = df.observe(obs, _ROWS)
        elif op == "fix_missing":
            df = fix_missing_values(df, step["strategies"])
            column = ",".join(step["strategies"])
            obs = Observation(f"clean_{i}")
            df = df.observe(obs, _ROWS)
        elif op == "standardize_phones":
            column = step["column"]
            # compare old vs new in one frame (no join); the metric
            # binds before __old is projected away
            tagged = standardize_phone_numbers(
                df.withColumn("__old", F.col(column)), column
            )
            obs = Observation(f"clean_{i}")
            changed_metric = "changed"
            tagged = tagged.observe(
                obs, _ROWS,
                F.sum(
                    (~F.col(column).eqNullSafe(F.col("__old"))).cast("long")
                ).alias("changed"),
            )
            df = tagged.drop("__old")
        elif op == "validate_emails":
            column = step["column"]
            strategy = step.get("strategy", "flag")
            tagged = validate_emails(
                df.withColumn("__old", F.col(column)), column,
                strategy=strategy,
            )
            obs = Observation(f"clean_{i}")
            changed_metric = "changed"
            if strategy == "flag":
                chg = F.sum((~F.col(f"{column}_valid")).cast("long"))
            else:
                chg = F.sum(
                    (~F.col(column).eqNullSafe(F.col("__old"))).cast("long")
                )
            tagged = tagged.observe(obs, _ROWS, chg.alias("changed"))
            df = tagged.drop("__old")
        elif op == "drop_rows_where":
            column = None
            df = df.filter(f"NOT ({step['condition']})")
            obs = Observation(f"clean_{i}")
            df = df.observe(obs, _ROWS)
        else:
            raise ValueError(f"unknown cleaning operation: {op!r}")
        step_meta.append((op, column, obs, changed_metric))

    # ONE action materializes every observation along the chain
    df.count()

    results: list[CleaningResult] = []
    prev_rows = obs_in.get["rows"]
    for op, column, obs, changed_metric in step_meta:
        got = obs.get
        rows_after = got["rows"]
        changed = got.get(changed_metric) or 0 if changed_metric else 0
        results.append(CleaningResult(
            op, column, prev_rows, rows_after, int(changed)
        ))
        prev_rows = rows_after
    return df, results


# Redaction patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # TPC-H style international phone: CC-XXX-XXX-XXXX
    "phone": (r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
}


def redact_pii(
    df: DataFrame,
    columns: list[str],
    patterns: dict[str, tuple[str, str]] | None = None,
    count_col: str | None = "pii_redactions",
) -> DataFrame:
    """Scrub PII from text columns before a corpus ships to training:
    each named pattern is counted (pre-replacement) and replaced with its
    placeholder, chained in a fixed order so overlapping patterns (SSN
    inside a longer phone shape) resolve deterministically. Pure
    regexp_count/regexp_replace expressions — codegen, no UDFs.

    `count_col`: total replacements across all columns+patterns (None to
    skip). The per-row count is what corpus-curation audits aggregate.
    """
    pats = patterns or PII_PATTERNS
    redacted: dict[str, Column] = {}
    counts: list[Column] = []
    for c in columns:
        col = F.col(c)
        for pat, repl in pats.values():
            # count against the chain state BEFORE this pattern's
            # replacement, so the total is exactly the number of
            # substitutions the chain performs
            counts.append(F.regexp_count(col, F.lit(pat)))
            col = F.regexp_replace(col, pat, repl)
        redacted[c] = col
    # one projection: counts and replacements all bind to the ORIGINAL
    # columns (withColumn-per-column would rebind counts to already-
    # redacted text and always count zero)
    out = [
        redacted[f.name].alias(f.name) if f.name in redacted else F.col(f.name)
        for f in df.schema.fields
    ]
    if count_col:
        total = counts[0]
        for extra in counts[1:]:
            total = total + extra
        out.append(total.cast("long").alias(count_col))
    return df.select(*out)


def luhn_pan_scan(
    df: DataFrame,
    column: str,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Payment-card-number (PAN) detection with Luhn checksum
    verification — the high-precision tier above `redact_pii`'s
    shape-only credit-card regex: a 16-digit string is only flagged
    `luhn_valid` if its mod-10 check digit is consistent, which cuts
    false positives on order numbers / tracking codes by ~90% (only 1
    in 10 random digit strings passes Luhn).

    Candidates are MAXIMAL runs of digits, spaces, and dashes whose
    digit count is 13-19 after separator stripping (maximal-run
    extraction is unambiguous across regex engines — no lookbehind,
    which distributed SQL oracles lack). Runs of adjacent
    space-separated numbers merge and are rejected by the length gate;
    that trades recall on pathological layouts for engine-portable
    determinism. The checksum is one fold over the digit string —
    pure column expressions, codegen, zero shuffle, zero UDFs.

    Output: one row per candidate (id_cols or all input columns kept)
    with `pan_masked` (first 6 + stars + last 4 — the raw PAN never
    leaves the expression), `pan_network` (prefix classification),
    `pan_len`, `luhn_valid`.
    """
    keep = id_cols if id_cols is not None else list(df.columns)
    cand = F.explode(
        F.regexp_extract_all(
            F.col(column), F.lit(r"[0-9][0-9 \-]*[0-9]"), F.lit(0)
        )
    ).alias("__cand")
    base = df.select(*keep, cand)
    norm = F.regexp_replace(F.col("__cand"), r"[ \-]", "")
    n = F.length(norm)
    rev = F.reverse(norm)
    digit = lambda i: F.substring(rev, i, F.lit(1)).cast("int")  # noqa: E731
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(i % 2 == 1, digit(i)).otherwise(
            F.when(digit(i) * 2 > 9, digit(i) * 2 - 9)
            .otherwise(digit(i) * 2)
        ),
    )
    network = (
        F.when(norm.startswith("4"), "visa")
        .when(norm.rlike("^5[1-5]"), "mastercard")
        .when(norm.rlike("^3[47]"), "amex")
        .when(norm.rlike("^6(011|5)"), "discover")
        .otherwise("other")
    )
    return (
        base.withColumn("__norm", norm)
        .filter(F.length("__norm").between(13, 19))
        .select(
            *keep,
            F.concat(
                F.substring("__norm", 1, 6),
                F.repeat(F.lit("*"), F.length("__norm") - 10),
                F.substring(
                    F.col("__norm"), F.length("__norm") - 3, F.lit(4)
                ),
            ).alias("pan_masked"),
            network.alias("pan_network"),
            F.length("__norm").cast("int").alias("pan_len"),
            (luhn_sum % 10 == 0).alias("luhn_valid"),
        )
    )
