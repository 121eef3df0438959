"""Privacy auditing over quasi-identifier combinations: k-anonymity and
l-diversity checks (Sweeney 2002 / Machanavajjhala et al. 2007 — the
standard re-identification-risk audits a dataset release runs before
shipping).

Everything is one groupBy on the quasi-identifier tuple — a single
shuffle whose result is one row per equivalence class, bounded by the
attribute-domain product, never the corpus. No UDFs.

Extension surface: the reference's governance layer stops at quality
metrics and PII redaction (src/data_pipeline/utils/quality_monitor.py);
re-identification auditing is the release-gate complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity", "anonymity_summary"]


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Equivalence-class audit: one row per distinct quasi-identifier
    combination with its class size and whether it meets k-anonymity
    (class_size >= k). With ``sensitive_col`` the class also carries its
    distinct sensitive-value count, and with ``l`` a meets_l flag
    (distinct-l-diversity: >= l distinct sensitive values per class).

    A class of size < k means any record in it is re-identifiable to
    within k-1 candidates by someone who knows the quasi-identifiers;
    a class failing l-diversity leaks the sensitive value outright even
    when k is met (everyone in the class shares it).
    """
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).alias("distinct_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs).withColumn(
        "meets_k", F.col("class_size") >= k
    )
    if sensitive_col is not None and l is not None:
        out = out.withColumn("meets_l", F.col("distinct_sensitive") >= l)
    return out


def anonymity_summary(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row release-gate summary over the class table: total classes,
    classes below k, rows at risk (living in a sub-k class), smallest
    class, and the fraction of rows at risk."""
    classes = k_anonymity(df, quasi_cols, k=k)
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(~F.col("meets_k"), 1).otherwise(0)).alias(
            "classes_below_k"
        ),
        F.sum(
            F.when(~F.col("meets_k"), F.col("class_size")).otherwise(0)
        ).alias("rows_at_risk"),
        F.min("class_size").alias("min_class_size"),
        (
            F.sum(
                F.when(~F.col("meets_k"), F.col("class_size")).otherwise(0)
            ).cast("double")
            / F.sum("class_size")
        ).alias("risk_fraction"),
    )
