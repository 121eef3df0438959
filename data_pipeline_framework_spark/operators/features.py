"""Feature-engineering operators (reference transformations/feature_engineering.py).

Output-naming conventions preserved from the reference:
  ratios   `{num}_to_{den}_ratio`       (feature_engineering.py:344-392)
  pairs    `{a}_x_{b}` multiply, `{a}_plus_{b}`, `{a}_minus_{b}` (:394-448)
  binning  `{col}_binned`               (:74-139)
  encoding `{col}_freq`, `{col}_label`, onehot `{col}_{value}` (:227-296)
  group    `{col}_{func}_by_{keys}`     (:298-342)
  poly     `{col}_pow_{d}`              (:18-72)

Everything here is pure column expressions / window aggs; the MLlib-backed
variants (quantile/kmeans binning, PCA, clustering) live in ml_features.py
so this module imports nothing heavier than pyspark.sql.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def create_ratio_features(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    on_zero: str = "null",
) -> DataFrame:
    """`{num}_to_{den}_ratio` with div-zero policy null|zero
    (reference feature_engineering.py:344-392)."""
    cols = {}
    for num, den in pairs:
        ratio = F.try_divide(F.col(num), F.col(den))
        if on_zero == "zero":
            ratio = F.coalesce(ratio, F.lit(0.0))
        cols[f"{num}_to_{den}_ratio"] = ratio
    return df.withColumns(cols)


def create_interaction_features(
    df: DataFrame,
    columns: list[str],
    operations: list[str] = ("multiply",),
) -> DataFrame:
    """Pairwise multiply/add/subtract (reference feature_engineering.py:394-448)."""
    cols = {}
    for a, b in combinations(columns, 2):
        for op in operations:
            if op == "multiply":
                cols[f"{a}_x_{b}"] = F.col(a) * F.col(b)
            elif op == "add":
                cols[f"{a}_plus_{b}"] = F.col(a) + F.col(b)
            elif op == "subtract":
                cols[f"{a}_minus_{b}"] = F.col(a) - F.col(b)
            else:
                raise ValueError(f"unsupported interaction op: {op!r}")
    return df.withColumns(cols)


def create_polynomial_features(
    df: DataFrame, columns: list[str], degree: int = 2
) -> DataFrame:
    """Per-column powers `{col}_pow_{d}` + pairwise cross products
    (reference feature_engineering.py:18-72, sklearn PolynomialFeatures)."""
    cols = {}
    for c in columns:
        for d in range(2, degree + 1):
            cols[f"{c}_pow_{d}"] = F.pow(F.col(c), d)
    for a, b in combinations(columns, 2):
        cols[f"{a}_x_{b}"] = F.col(a) * F.col(b)
    return df.withColumns(cols)


def create_binning_features(
    df: DataFrame,
    column: str,
    strategy: str = "uniform",
    bins: int = 5,
    labels: list[str] | None = None,
) -> DataFrame:
    """`{col}_binned` (reference feature_engineering.py:74-139).

    uniform: equal-width bins from one global min/max agg (broadcast back —
    no driver collect in the plan). quantile: exact percentile edges.
    Bin ids are 0..bins-1; `labels` maps ids to names.
    """
    out_col = f"{column}_binned"
    if strategy == "uniform":
        bounds = df.agg(
            F.min(column).alias("__lo"), F.max(column).alias("__hi")
        )
        d = df.crossJoin(F.broadcast(bounds))
        width = (F.col("__hi") - F.col("__lo")) / bins
        idx = F.floor((F.col(column) - F.col("__lo")) / width)
        idx = F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))
        binned = F.when(F.col(column).isNotNull(), idx)
    elif strategy == "quantile":
        probs = [i / bins for i in range(1, bins)]
        edges = df.agg(
            *[
                F.percentile(column, F.lit(p)).alias(f"__e{i}")
                for i, p in enumerate(probs)
            ]
        )
        d = df.crossJoin(F.broadcast(edges))
        idx = F.lit(0)
        for i in range(len(probs)):
            idx = idx + (F.col(column) > F.col(f"__e{i}")).cast("int")
        binned = F.when(F.col(column).isNotNull(), idx)
    else:
        raise ValueError(f"unsupported binning strategy: {strategy!r}")
    if labels:
        mapping = F.array(*[F.lit(x) for x in labels])
        binned = mapping[binned.cast("int")]
    d = d.withColumn(out_col, binned)
    return d.drop(*[c for c in d.columns if c.startswith("__")])


def create_categorical_features(
    df: DataFrame,
    column: str,
    encoding: str = "frequency",
    top_n: int | None = None,
    one_hot_values: list[str] | None = None,
    max_categories: int = 256,
) -> DataFrame:
    """frequency / label / onehot encoding with optional top-N 'other'
    bucketing (reference feature_engineering.py:227-296).

    frequency: count over a partition window (no join). label:
    alphabetical rank of the category — deterministic, stable under
    parallelism (the reference used first-seen order, which is not;
    documented deviation). onehot: explicit value list
    (`one_hot_values`) keeps the schema static — at 100 TB you never
    want a distinct-collect to decide the output schema implicitly.

    Both label and onehot discover at most ``max_categories`` distinct
    values (bounded driver collect) and raise above that — pass
    `one_hot_values` / use `top_n` bucketing / raise `max_categories`
    for wider domains. label previously dense_ranked the distinct
    table through a single-partition window; the input was bounded but
    the WindowExec "No Partition Defined" warning it emitted is
    indistinguishable in logs from a real global-window mistake, so
    the rank is now assigned driver-side on the same bounded collect
    onehot uses (VERDICT r8).
    """
    c = F.col(column)
    if top_n is not None:
        top = [
            r[0]
            for r in df.groupBy(column)
            .count()
            .orderBy(F.desc("count"), F.asc(column))
            .limit(top_n)
            .collect()
        ]
        df = df.withColumn(
            column, F.when(c.isin(top), c).otherwise(F.lit("other"))
        )
        c = F.col(column)
    cols = df.columns
    if encoding == "frequency":
        # groupBy + broadcast-join back, NOT count().over(partitionBy(col)):
        # the window form shuffles every fact row by category (hot category
        # = one reducer); the agg form combines map-side and moves only
        # |categories| rows.
        freqs = df.groupBy(column).agg(
            F.count(F.lit(1)).alias(f"{column}_freq")
        ).withColumnRenamed(column, "__cat")
        return df.join(
            F.broadcast(freqs), F.col(column).eqNullSafe(F.col("__cat"))
        ).select(*cols, f"{column}_freq")
    if encoding == "label":
        # label = alphabetical rank of the DISTINCT categories (NULL
        # first, matching orderBy-asc semantics), assigned on a bounded
        # driver collect and broadcast-joined back. No window anywhere:
        # a single-partition WindowExec — even over a tiny frame —
        # emits the same "No Partition Defined" warning a real
        # global-window mistake does.
        from pyspark.sql import types as T

        discovered = [
            r[0]
            for r in df.select(column).distinct()
            .limit(max_categories + 1).collect()
        ]
        if len(discovered) > max_categories:
            raise ValueError(
                f"label encoding of {column!r} found more than "
                f"{max_categories} distinct values; use top_n "
                "bucketing or raise max_categories"
            )
        ordered = sorted(discovered, key=lambda v: (v is not None, v))
        labels = df.sparkSession.createDataFrame(
            [(v, i) for i, v in enumerate(ordered)],
            T.StructType([
                T.StructField("__cat", df.schema[column].dataType),
                T.StructField(f"{column}_label", T.IntegerType(), False),
            ]),
        )
        return df.join(
            F.broadcast(labels), F.col(column).eqNullSafe(F.col("__cat"))
        ).select(*cols, f"{column}_label")
    if encoding == "onehot":
        if one_hot_values is None:
            # Bounded discovery: collect at most max_categories+1 distinct
            # values so a high-cardinality column raises instead of OOMing
            # the driver and exploding the output schema. Pass
            # one_hot_values (or top_n bucketing) explicitly to override.
            discovered = [
                r[0]
                for r in df.select(column).distinct()
                .filter(c.isNotNull()).limit(max_categories + 1).collect()
            ]
            if len(discovered) > max_categories:
                raise ValueError(
                    f"onehot encoding of {column!r} found more than "
                    f"{max_categories} distinct values; pass "
                    "one_hot_values explicitly, use top_n bucketing, or "
                    "raise max_categories"
                )
            one_hot_values = sorted(discovered)
        return df.withColumns(
            {
                f"{column}_{v}": (c == v).cast("int")
                for v in one_hot_values
            }
        )
    raise ValueError(f"unsupported encoding: {encoding!r}")


def create_aggregation_features(
    df: DataFrame,
    group_by: list[str],
    aggregations: dict[str, list[str]],
) -> DataFrame:
    """Group stats merged back per row — window aggs, NO join
    (reference feature_engineering.py:298-342 did groupby+merge).
    Output `{col}_{func}_by_{keys}`."""
    w = Window.partitionBy(*group_by)
    suffix = "_".join(group_by)
    fns = {"mean": F.avg, "avg": F.avg, "sum": F.sum, "min": F.min,
           "max": F.max, "count": F.count, "std": F.stddev}
    cols = {}
    for col, funcs in aggregations.items():
        for fn in funcs:
            cols[f"{col}_{fn}_by_{suffix}"] = fns[fn](col).over(w)
    return df.withColumns(cols)


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of y on x from closed-form
    moment sums — slope, intercept, Pearson r^2, n. The "fit a line per
    key" primitive (per-SKU price elasticity, per-source quality trend,
    per-series drift) that pandas does with groupby-apply loops; here
    it is ONE aggregation: every moment (n, Σx, Σy, Σxy, Σx², Σy²) is a
    plain SUM, so the whole fit is a single map-side-combinable shuffle
    keyed on the group — no per-group collect, no UDF, and any engine
    replays it from the same six sums.

    Degenerate groups (n < 2 or zero x-variance) return NULL slope/
    intercept/r2 via try_divide rather than erroring — at 100 TB some
    group always is.

    Reference parity: none (its feature engineering stops at
    polynomial/ratio/interaction transforms,
    reference transformations/feature_engineering.py); scale-ops
    extension.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    n = F.col("n").cast("double")
    cov_n = F.col("__sxy") - F.col("__sx") * F.col("__sy") / n
    var_x_n = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n
    var_y_n = F.col("__syy") - F.col("__sy") * F.col("__sy") / n
    slope = F.when(n >= 2, F.try_divide(cov_n, var_x_n))
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = F.when(
        n >= 2, F.try_divide(cov_n * cov_n, var_x_n * var_y_n)
    )
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
