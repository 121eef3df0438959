"""Operation-DSL compiler: list of op dicts -> ONE lazy DataFrame plan.

The reference interprets a YAML `processing.operations` list eagerly, one
pandas/Spark step per op (reference processors/pandas_processor.py:19-52,
processors/spark_processor.py:45-82). Here every op compiles to a
DataFrame->DataFrame closure and the whole list folds into a single lazy
chain, so Catalyst sees the complete plan and can push filters into the
scan, prune columns, reorder joins, and pick join strategies — none of
which the reference's eager interpreter could do.

Op vocabulary (parity with reference §2.3-2.10, §2.15-2.16 of SURVEY.md):
    select, filter, transform, aggregate, join, sort, deduplicate, clean,
    pivot, melt, window, custom_sql, union, limit, sample, repartition.

Scale notes are inline per-op; the common themes:
  * never collect() except for scalar fills (mean/median), batched one agg
  * joins accept a `broadcast` hint for dimension tables
  * everything stays in Spark SQL expressions (whole-stage codegen), no
    row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OpFn = Callable[[DataFrame], DataFrame]
TableResolver = Callable[[str], DataFrame]

# Null representations the reference's `clean` op standardizes to NULL
# (reference processors/pandas_processor.py:208-213).
NULL_REPRS = ["", "null", "NULL", "None", "N/A", "n/a", "#N/A"]

# ---------------------------------------------------------------------------
# helpers


def _listify(x) -> list:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


def _string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]


def _filter_predicate(column: str, operator: str, value) -> Column:
    """Column/op/value predicates (reference pandas_processor.py:60-85)."""
    c = F.col(column)
    ops: dict[str, Callable[[], Column]] = {
        "==": lambda: c == value,
        "=": lambda: c == value,
        "!=": lambda: c != value,
        ">": lambda: c > value,
        "<": lambda: c < value,
        ">=": lambda: c >= value,
        "<=": lambda: c <= value,
        "in": lambda: c.isin(list(value)),
        "not_in": lambda: ~c.isin(list(value)),
        "contains": lambda: c.contains(value),
        "starts_with": lambda: c.startswith(value),
        "ends_with": lambda: c.endswith(value),
        "is_null": lambda: c.isNull(),
        "not_null": lambda: c.isNotNull(),
        "between": lambda: c.between(value[0], value[1]),
    }
    if operator not in ops:
        raise ValueError(f"unsupported filter operator: {operator!r}")
    return ops[operator]()


# ---------------------------------------------------------------------------
# op implementations


def _op_select(params: Mapping, ctx) -> OpFn:
    """Keep listed columns, or drop the `exclude` list
    (reference pandas_processor.py:89-97, spark_processor.py:91-100)."""
    columns = params.get("columns")
    exclude = params.get("exclude")

    def fn(df: DataFrame) -> DataFrame:
        if columns:
            return df.select(*columns)
        if exclude:
            return df.drop(*exclude)
        return df

    return fn


def _op_filter(params: Mapping, ctx) -> OpFn:
    """SQL-string or column/op/value filters
    (reference pandas_processor.py:57-85, spark_processor.py:84-89)."""
    condition = params.get("condition")
    filters = params.get("filters")
    if filters is None and "column" in params:
        filters = [params]

    def fn(df: DataFrame) -> DataFrame:
        out = df
        if condition:
            out = out.filter(condition)
        for f in filters or []:
            out = out.filter(
                _filter_predicate(f["column"], f.get("operator", "=="), f.get("value"))
            )
        return out

    return fn


def _transform_one(df: DataFrame, t: Mapping) -> DataFrame:
    """One `transform` sub-op (reference pandas_processor.py:99-155,
    spark_processor.py:102-154). Output naming conventions preserved:
    `{col}_year/_month/_day/_weekday` for extract_date_parts."""
    ttype = t["type"]

    if ttype == "rename":
        out = df
        for old, new in t["mapping"].items():
            out = out.withColumnRenamed(old, new)
        return out

    if ttype == "cast":
        return df.withColumns(
            {c: F.col(c).cast(dtype) for c, dtype in t["columns"].items()}
        )

    if ttype == "fill_null":
        return _fill_null(df, t)

    if ttype == "calculate":
        return df.withColumn(t["column"], F.expr(t["expression"]))

    if ttype == "extract_date_parts":
        col = t["column"]
        parts = t.get("parts", ["year", "month", "day", "weekday"])
        exprs = {
            "year": F.year(col),
            "month": F.month(col),
            "day": F.dayofmonth(col),
            # reference uses pandas .dt.dayofweek (Mon=0); Spark dayofweek is
            # Sun=1..Sat=7 — normalize to the reference's Mon=0 convention.
            "weekday": (F.dayofweek(col) + 5) % 7,
            "hour": F.hour(col),
            "quarter": F.quarter(col),
        }
        return df.withColumns({f"{col}_{p}": exprs[p] for p in parts})

    if ttype == "regex_extract":
        new_col = t.get("new_column", t["column"])
        return df.withColumn(
            new_col, F.regexp_extract(F.col(t["column"]), t["pattern"], t.get("group", 1))
        )

    if ttype == "string_operations":
        cols = _listify(t.get("columns") or t.get("column"))
        out = df
        for op in _listify(t.get("operations") or t.get("operation")):
            if op == "lower":
                out = out.withColumns({c: F.lower(F.col(c)) for c in cols})
            elif op == "upper":
                out = out.withColumns({c: F.upper(F.col(c)) for c in cols})
            elif op in ("strip", "trim"):
                out = out.withColumns({c: F.trim(F.col(c)) for c in cols})
            elif op == "replace":
                out = out.withColumns(
                    {
                        c: F.regexp_replace(F.col(c), t["pattern"], t["replacement"])
                        for c in cols
                    }
                )
            else:
                raise ValueError(f"unsupported string operation: {op!r}")
        return out

    raise ValueError(f"unsupported transform type: {ttype!r}")


def _fill_null(df: DataFrame, t: Mapping) -> DataFrame:
    """fill_null: value / mean / median / mode / ffill / bfill
    (reference pandas_processor.py:113-125, data_cleaner.py:40-114).

    Scalar fills (mean/median/mode) need ONE batched agg action — the
    reference collect()s per column (spark_processor.py:121-123); we agg all
    requested columns in a single pass. ffill/bfill are window fills and
    stay fully lazy/distributed.
    """
    cols = _listify(t.get("columns") or t.get("column"))
    method = t.get("method", "value")

    if method == "value":
        return df.fillna(t["value"], subset=cols or None)

    if method in ("mean", "median", "mode"):
        if method == "mean":
            aggs = [F.avg(c).alias(c) for c in cols]
        elif method == "median":
            aggs = [F.median(c).alias(c) for c in cols]
        else:
            aggs = [F.mode(c).alias(c) for c in cols]
        row = df.agg(*aggs).first().asDict()
        return df.fillna({c: row[c] for c in cols if row[c] is not None})

    if method in ("ffill", "bfill"):
        order = _listify(t.get("order_by"))
        if not order:
            raise ValueError("ffill/bfill require order_by for deterministic fills")
        part = _listify(t.get("partition_by"))
        w = Window.partitionBy(*part) if part else Window.partitionBy(F.lit(1))
        if method == "ffill":
            w = w.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
            fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        else:
            w = w.orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
            fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
        return df.withColumns({c: fill(c) for c in cols})

    raise ValueError(f"unsupported fill_null method: {method!r}")


def _op_transform(params: Mapping, ctx) -> OpFn:
    transformations = params.get("transformations") or [params]

    def fn(df: DataFrame) -> DataFrame:
        for t in transformations:
            df = _transform_one(df, t)
        return df

    return fn


# Aggregation functions the DSL accepts -> pyspark.sql.functions name.
_AGG_FUNCS = {
    "sum": "sum",
    "mean": "avg",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "count": "count",
    "nunique": "countDistinct",
    "count_distinct": "countDistinct",
    "approx_count_distinct": "approx_count_distinct",
    "std": "stddev",
    "stddev": "stddev",
    "var": "variance",
    "variance": "variance",
    "first": "first",
    "last": "last",
    "median": "median",
    "skew": "skewness",
    "kurtosis": "kurtosis",
    "collect_set": "collect_set",
    "collect_list": "collect_list",
}


def build_agg_exprs(aggregations: Mapping[str, Any]) -> list[Column]:
    """`{col: func | [funcs]}` -> aliased agg Columns named `{col}_{func}`
    (the reference's output naming, pandas_processor.py:157-165,
    spark_processor.py:156-171)."""
    exprs: list[Column] = []
    for col, funcs in aggregations.items():
        for func in _listify(funcs):
            spark_fn = _AGG_FUNCS.get(func)
            if spark_fn is None:
                raise ValueError(f"unsupported aggregation function: {func!r}")
            exprs.append(getattr(F, spark_fn)(col).alias(f"{col}_{func}"))
    return exprs


def _op_aggregate(params: Mapping, ctx) -> OpFn:
    """Grouped / global aggregation with `{col}_{func}` output names;
    group_by without aggs -> per-group count; neither -> summary()
    (reference pandas_processor.py:157-177, spark_processor.py:156-183)."""
    group_by = _listify(params.get("group_by"))
    aggregations = params.get("aggregations") or {}

    def fn(df: DataFrame) -> DataFrame:
        exprs = build_agg_exprs(aggregations)
        if group_by and exprs:
            return df.groupBy(*group_by).agg(*exprs)
        if group_by:
            return df.groupBy(*group_by).count()
        if exprs:
            return df.agg(*exprs)
        return df.summary()

    return fn


def _op_join(params: Mapping, ctx) -> OpFn:
    """Equi/theta join (reference pandas_processor.py:179-188,
    spark_processor.py:185-194) plus Spark-native extras the reference
    lacked: `broadcast: true` hint for dimension tables and semi/anti join
    types. Catalyst + AQE pick hash/sort-merge/broadcast physically."""
    how = params.get("how", params.get("join_type", "inner"))
    broadcast_right = bool(params.get("broadcast", False))

    def fn(df: DataFrame) -> DataFrame:
        right = params.get("right")
        if isinstance(right, str):
            right = ctx.resolve(right)
        if broadcast_right:
            right = F.broadcast(right)
        if "condition" in params:
            return df.join(right, F.expr(params["condition"]), how)
        if "on" in params:
            return df.join(right, _listify(params["on"]), how)
        left_on = _listify(params["left_on"])
        right_on = _listify(params["right_on"])
        cond = None
        for lc, rc in zip(left_on, right_on):
            c = df[lc] == right[rc]
            cond = c if cond is None else (cond & c)
        return df.join(right, cond, how)

    return fn


def _op_sort(params: Mapping, ctx) -> OpFn:
    """Multi-column sort with per-column direction
    (reference pandas_processor.py:190-193, spark_processor.py:196-211)."""
    by = _listify(params.get("by") or params.get("columns"))
    ascending = params.get("ascending", True)
    if isinstance(ascending, bool):
        ascending = [ascending] * len(by)

    def fn(df: DataFrame) -> DataFrame:
        cols = [F.asc(c) if a else F.desc(c) for c, a in zip(by, ascending)]
        return df.orderBy(*cols)

    return fn


def _op_deduplicate(params: Mapping, ctx) -> OpFn:
    """dropDuplicates(subset) with keep=first/last/any
    (reference pandas_processor.py:195-198, spark_processor.py:213-218).

    keep='any' maps straight to dropDuplicates (cheapest: partial agg both
    sides of the shuffle). keep='first'/'last' require an order_by for
    distributed determinism and compile to a row_number window.
    """
    subset = _listify(params.get("subset"))
    keep = params.get("keep", "any")
    order_by = _listify(params.get("order_by"))

    def fn(df: DataFrame) -> DataFrame:
        if not subset:
            return df.distinct()
        if keep == "any" or not order_by:
            return df.dropDuplicates(subset)
        order = [F.asc(c) if keep == "first" else F.desc(c) for c in order_by]
        w = Window.partitionBy(*subset).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    return fn


def _op_clean(params: Mapping, ctx) -> OpFn:
    """Composite cleaner (reference pandas_processor.py:200-221):
    remove_empty_rows, remove_empty_columns, trim_strings,
    standardize_nulls."""
    operations = _listify(params.get("operations")) or [
        "remove_empty_rows",
        "trim_strings",
        "standardize_nulls",
    ]

    def fn(df: DataFrame) -> DataFrame:
        out = df
        # standardize before the empty-row drop so 'N/A'-only rows drop too
        if "standardize_nulls" in operations:
            scols = _string_columns(out)
            out = out.withColumns(
                {
                    c: F.when(F.trim(F.col(c)).isin(NULL_REPRS), None).otherwise(
                        F.col(c)
                    )
                    for c in scols
                }
            )
        if "trim_strings" in operations:
            scols = _string_columns(out)
            out = out.withColumns({c: F.trim(F.col(c)) for c in scols})
        if "remove_empty_rows" in operations:
            out = out.na.drop(how="all")
        if "remove_empty_columns" in operations:
            # needs one agg action: a column is empty iff count(col)==0
            counts = out.agg(
                *[F.count(c).alias(c) for c in out.columns]
            ).first()
            empty = [c for c in out.columns if counts[c] == 0]
            if empty:
                out = out.drop(*empty)
        return out

    return fn


def _op_pivot(params: Mapping, ctx) -> OpFn:
    """groupBy().pivot().agg() (reference pandas_processor.py:223-226,
    spark_processor.py:220-223, transformations/pivot_operations.py:14-66).

    Pass `pivot_values` for a deterministic column set (and to skip the
    distinct-values scan — at 100 TB you never want an implicit
    collect-distinct before a pivot)."""
    index = _listify(params["index"])
    pivot_col = params["columns"]
    values = _listify(params.get("values"))
    aggfunc = params.get("aggfunc", "sum")
    pivot_values = params.get("pivot_values")
    fill_value = params.get("fill_value")

    def fn(df: DataFrame) -> DataFrame:
        gp = df.groupBy(*index)
        pv = gp.pivot(pivot_col, pivot_values) if pivot_values else gp.pivot(pivot_col)
        fname = _AGG_FUNCS.get(aggfunc, aggfunc)
        if len(values) == 1:
            out = pv.agg(getattr(F, fname)(values[0]))
        else:
            out = pv.agg(
                *[getattr(F, fname)(v).alias(f"{v}_{aggfunc}") for v in values]
            )
        if fill_value is not None:
            out = out.fillna(fill_value)
        return out

    return fn


def _op_melt(params: Mapping, ctx) -> OpFn:
    """melt/unpivot (reference pandas_processor.py:228-233,
    transformations/pivot_operations.py:68-106) -> native df.unpivot."""
    id_vars = _listify(params.get("id_vars"))
    value_vars = _listify(params.get("value_vars"))
    var_name = params.get("var_name", "variable")
    value_name = params.get("value_name", "value")

    def fn(df: DataFrame) -> DataFrame:
        vvars = value_vars or [c for c in df.columns if c not in id_vars]
        return df.unpivot(id_vars, vvars, var_name, value_name)

    return fn


def _op_window(params: Mapping, ctx) -> OpFn:
    """Window op (reference spark_processor.py:225-265): ranking/offset/agg
    function over a partition/order/frame spec. Full library lives in
    operators/window_ops.py; this DSL entry covers the reference's op."""
    from ..operators.window_ops import apply_window_function

    def fn(df: DataFrame) -> DataFrame:
        return apply_window_function(
            df,
            function=params["function"],
            partition_by=_listify(params.get("partition_by")),
            order_by=_listify(params.get("order_by")),
            column=params.get("column"),
            new_column=params.get("new_column"),
            rows_between=params.get("rows_between"),
            range_between=params.get("range_between"),
            **{
                k: v
                for k, v in params.items()
                if k
                in ("n", "periods", "default", "window", "min_periods", "method")
            },
        )

    return fn


def _op_custom_sql(params: Mapping, ctx) -> OpFn:
    """Register current frame as a temp view, run arbitrary Spark SQL
    (reference spark_processor.py:267-270). Full Spark SQL is part of the
    public query surface."""
    view = params.get("view_name", "current_data")
    query = params["query"]

    def fn(df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(view)
        return df.sparkSession.sql(query)

    return fn


def _op_custom(params: Mapping, ctx) -> OpFn:
    """`custom` op (reference pandas_processor.py:235-248, which `eval`s a
    lambda string row-wise). Arbitrary eval of config strings is rejected
    by design (SURVEY §2.15); supported safely:

      {"type": "custom", "column": c, "expression": "<Spark SQL expr>"}
          -> F.expr, JVM-side, codegen'd (the fast path)
      {"type": "custom", "column": c, "function": "name",
       "args": [cols...], "returns": "double"}
          -> a Python callable pre-registered via compile_ops(udfs=...),
             wrapped as a pandas UDF (Arrow-batched), never a row UDF.
    """
    column = params["column"]
    if "expression" in params:
        expr = params["expression"]
        return lambda df: df.withColumn(column, F.expr(expr))
    fname = params["function"]
    args = _listify(params.get("args"))
    returns = params.get("returns", "double")

    def fn(df: DataFrame) -> DataFrame:
        func = ctx.resolve_udf(fname)
        pudf = F.pandas_udf(func, returns)
        return df.withColumn(column, pudf(*[F.col(a) for a in args]))

    return fn


def _op_union(params: Mapping, ctx) -> OpFn:
    """unionByName with missing-column fill — pandas-concat alignment
    semantics for multi-file reads (reference csv_source.py:62)."""

    def fn(df: DataFrame) -> DataFrame:
        other = params["other"]
        if isinstance(other, str):
            other = ctx.resolve(other)
        if params.get("by_name", True):
            return df.unionByName(other, allowMissingColumns=True)
        return df.union(other)

    return fn


def _op_limit(params: Mapping, ctx) -> OpFn:
    n = int(params["n"])
    return lambda df: df.limit(n)


def _op_sample(params: Mapping, ctx) -> OpFn:
    fraction = float(params["fraction"])
    seed = params.get("seed", 42)
    return lambda df: df.sample(fraction=fraction, seed=seed)


def _op_repartition(params: Mapping, ctx) -> OpFn:
    """Explicit partitioning control — co-locate before repeated joins/aggs
    on the same key, or size output files."""
    num = params.get("num")
    cols = _listify(params.get("columns"))

    def fn(df: DataFrame) -> DataFrame:
        if num and cols:
            return df.repartition(int(num), *cols)
        if cols:
            return df.repartition(*cols)
        if num:
            return df.repartition(int(num))
        return df

    return fn


def _op_hash_sample(params: Mapping, ctx) -> OpFn:
    """Deterministic hash sampling (partitioning-independent, unlike the
    RNG `sample` op) — `{"type": "hash_sample", "id_column": c,
    "rate": 0.1, "seed": "s0"}`."""
    from ..functions.sampling import hash_sample

    idc = params["id_column"]
    rate = float(params["rate"])
    seed = str(params.get("seed", "s0"))
    return lambda df: hash_sample(df, idc, rate, seed)


def _op_hash_split(params: Mapping, ctx) -> OpFn:
    """Train/val/test labeling — `{"type": "hash_split", "id_column": c,
    "fractions": {"train": .8, "val": .1, "test": .1}}`."""
    from ..functions.sampling import hash_split

    idc = params["id_column"]
    fractions = {k: float(v) for k, v in params["fractions"].items()}
    seed = str(params.get("seed", "split"))
    out = params.get("output_column", "split")
    return lambda df: hash_split(df, idc, fractions, seed, out)


def _op_mixture_sample(params: Mapping, ctx) -> OpFn:
    """Data-mixture resampling to target source proportions —
    `{"type": "mixture_sample", "id_column": c, "source_column": s,
    "token_column": t, "weights": {...}, "budget_tokens": N?}`."""
    from ..functions.sampling import mixture_sample

    idc = params["id_column"]
    src = params["source_column"]
    tok = params["token_column"]
    weights = {k: float(v) for k, v in params["weights"].items()}
    budget = params.get("budget_tokens")
    seed = str(params.get("seed", "mix"))
    return lambda df: mixture_sample(
        df, idc, src, tok, weights,
        int(budget) if budget is not None else None, seed,
    )


def _op_chunk(params: Mapping, ctx) -> OpFn:
    """Sliding-window document chunking — `{"type": "chunk",
    "id_column": c, "text_column": t, "window": 64, "stride": 48}`."""
    from ..functions.text import chunk_documents

    idc = params["id_column"]
    txt = params["text_column"]
    window = int(params.get("window", 64))
    stride = int(params.get("stride", 48))
    return lambda df: chunk_documents(df, idc, txt, window, stride)


def _op_token_count(params: Mapping, ctx) -> OpFn:
    """Token counting — `{"type": "token_count", "text_column": t,
    "output_column": "n_tokens", "tokenizer": "regex"|"whitespace"|"bpe",
    "merges_path": p?}`. "bpe" uses the packaged learned merges table
    (or `merges_path`) applied as JVM chained replaces; "regex" is the
    letters/digits/punct pre-tokenizer; "whitespace" plain words."""
    from ..functions.text import token_count
    from ..functions.tokenize import (
        BPETokenizer,
        WhitespaceTokenizer,
        load_merges,
    )

    txt = params["text_column"]
    out = params.get("output_column", "n_tokens")
    kind = params.get("tokenizer", "regex")
    if kind == "bpe":
        merges = (
            load_merges(params["merges_path"])
            if params.get("merges_path") else None
        )
        tok = BPETokenizer(merges)
    elif kind == "whitespace":
        tok = WhitespaceTokenizer()
    elif kind == "regex":
        tok = None
    else:
        raise ValueError(f"unsupported tokenizer: {kind!r}")
    return lambda df: token_count(df, txt, out_col=out, tokenizer=tok)


def _op_zorder(params: Mapping, ctx) -> OpFn:
    """Z-order layout clustering before a write — `{"type": "zorder",
    "columns": [{"column": c, "min": 0, "max": 100}, ...],
    "bits": 8, "partitions": N?}`."""
    from ..operators.layout import cluster_by_zorder

    specs = [
        (c["column"], float(c["min"]), float(c["max"]))
        for c in params["columns"]
    ]
    bits = int(params.get("bits", 8))
    num = params.get("partitions")
    return lambda df: cluster_by_zorder(
        df, specs, bits, int(num) if num is not None else None
    )


def _op_quantize_embeddings(params: Mapping, ctx) -> OpFn:
    """int8 embedding quantization — `{"type": "quantize_embeddings",
    "id_column": c, "vector_column": v}`."""
    from ..functions.similarity import quantize_embeddings

    idc = params.get("id_column", "vec_id")
    vec = params.get("vector_column", "embedding")
    out = params.get("output_column", "q")
    return lambda df: quantize_embeddings(df, idc, vec, out)


def _op_cap_per_key(params: Mapping, ctx) -> OpFn:
    """Per-key row quota (skew-proof two-stage top-k) —
    `{"type": "cap_per_key", "keys": [...], "cap": N, "id_column": c,
    "order_column": c?}`."""
    from ..functions.sampling import cap_per_key

    keys = _listify(params["keys"])
    cap = int(params["cap"])
    idc = params["id_column"]
    order = params.get("order_column")
    return lambda df: cap_per_key(df, keys, cap, idc, order)


def _op_weighted_sample(params: Mapping, ctx) -> OpFn:
    """Deterministic weighted top-k sample —
    `{"type": "weighted_sample", "id_column": c, "weight_column": w,
    "k": N}`."""
    from ..functions.sampling import weighted_sample

    return lambda df: weighted_sample(
        df, params["id_column"], params["weight_column"],
        int(params["k"]), str(params.get("seed", "wsamp")),
    )


def _op_checkpoint(params: Mapping, ctx) -> OpFn:
    """Materialization barrier inside a long op list —
    `{"type": "checkpoint"}` truncates lineage via localCheckpoint
    (cluster-memory/disk), `{"type": "checkpoint", "path": p}` writes
    parquet and re-reads it (durable across job restarts; the pattern
    iterative flows use so round N+1 plans don't replay rounds 1..N).
    The only op in the DSL that breaks the single-lazy-plan rule — by
    design, and only where the config asks for it."""
    path = params.get("path")
    eager = bool(params.get("eager", False))

    def fn(df: DataFrame) -> DataFrame:
        if path:
            df.write.mode("overwrite").parquet(path)
            return df.sparkSession.read.parquet(path)
        return df.localCheckpoint(eager=eager)

    return fn


def _op_funnel(params: Mapping, ctx) -> OpFn:
    """Ordered funnel — `{"type": "funnel", "steps": [...],
    "user_column": u, "type_column": t, "ts_column": ts,
    "within_seconds": W, "output": "stages"|"conversion"}` (default
    conversion summary)."""
    from ..operators.funnels import funnel_conversion, funnel_stages

    steps = list(params["steps"])
    kw = dict(
        user_col=params.get("user_column", "user_id"),
        type_col=params.get("type_column", "event_type"),
        ts_col=params.get("ts_column", "ts"),
        within_seconds=params.get("within_seconds"),
    )
    if params.get("output", "conversion") == "stages":
        return lambda df: funnel_stages(df, steps, **kw)
    return lambda df: funnel_conversion(df, steps, **kw)


def _op_cohort_retention(params: Mapping, ctx) -> OpFn:
    """Cohort retention matrix — `{"type": "cohort_retention",
    "user_column": u, "ts_column": ts, "period": "week"}`."""
    from ..operators.funnels import cohort_retention

    return lambda df: cohort_retention(
        df,
        user_col=params.get("user_column", "user_id"),
        ts_col=params.get("ts_column", "ts"),
        period=params.get("period", "week"),
    )


def _op_bm25(params: Mapping, ctx) -> OpFn:
    """BM25 retrieval — `{"type": "bm25", "queries_table": name,
    "k": 10, "id_column": c, "text_column": t, ...}`; the queries
    table resolves through the same CompileContext as join."""
    from ..functions.retrieval import bm25_topk

    queries = ctx.resolve(params["queries_table"])
    return lambda df: bm25_topk(
        df,
        queries,
        k=int(params.get("k", 10)),
        id_col=params.get("id_column", "doc_id"),
        text_col=params.get("text_column", "text"),
        query_id_col=params.get("query_id_column", "query_id"),
        query_text_col=params.get("query_text_column", "query_text"),
        k1=float(params.get("k1", 1.2)),
        b=float(params.get("b", 0.75)),
    )


def _op_classifier_score(params: Mapping, ctx) -> OpFn:
    """Hashed linear quality classifier — `{"type": "classifier_score",
    "id_column": "doc_id", "text_column": "text"}`. Adds n_tokens,
    margin and a sigmoid score column (`output_column`, default
    "prob"). Weights resolve in order: `train_label_column` trains
    in-pipeline with functions.text.train_hashed_classifier
    (distributed full-batch logistic regression, engine-exact dyadic
    steps — the CCNet-style fit-on-seed-labels recipe); an explicit
    `weights` list scores with a pretrained model; otherwise the
    committed TRAINED_QUALITY model is used. `min_score` optionally
    filters to rows at or above the threshold."""
    from ..functions.text import (
        TRAINED_QUALITY_BIAS,
        TRAINED_QUALITY_WEIGHTS,
        hashed_classifier_score,
        train_hashed_classifier,
    )

    idc = params.get("id_column", "doc_id")
    txt = params.get("text_column", "text")
    out_col = params.get("output_column", "prob")

    def fn(df: DataFrame) -> DataFrame:
        lab = params.get("train_label_column")
        if lab:
            model = train_hashed_classifier(
                df, idc, txt, lab,
                n_buckets=int(params.get("n_buckets", 64)),
                steps=int(params.get("steps", 20)),
                lr=float(params.get("lr", 1.0)),
            )
            w, b = model["weights"], model["bias"]
        elif params.get("weights") is not None:
            w = [float(x) for x in params["weights"]]
            b = float(params.get("bias", 0.0))
        else:
            w, b = TRAINED_QUALITY_WEIGHTS, TRAINED_QUALITY_BIAS
        scored = hashed_classifier_score(
            df, idc, txt, w, bias=b, out_col=out_col
        )
        if params.get("min_score") is not None:
            scored = scored.filter(
                F.col(out_col) >= float(params["min_score"])
            )
        return scored

    return fn


def _op_semantic_dedup(params: Mapping, ctx) -> OpFn:
    """SemDeDup — `{"type": "semantic_dedup", "threshold": 0.9,
    "id_column": c, "vector_column": v, "n_cells": 8, "dim": 64}`.
    Keeps only surviving rows when "filter": true (default returns the
    full keep/dup_of report)."""
    from ..functions.similarity import semantic_dedup

    idc = params.get("id_column", "vec_id")

    def fn(df: DataFrame) -> DataFrame:
        rep = semantic_dedup(
            df,
            threshold=float(params.get("threshold", 0.9)),
            id_col=idc,
            vec_col=params.get("vector_column", "embedding"),
            n_cells=int(params.get("n_cells", 8)),
            seed=int(params.get("seed", 7)),
            dim=params.get("dim"),
        )
        if params.get("filter", False):
            kept = rep.filter("keep").select(idc)
            return df.join(kept, idc, "left_semi")
        return rep

    return fn


def _op_remove_duplicate_spans(params: Mapping, ctx) -> OpFn:
    """ExactSubstr span removal — `{"type": "remove_duplicate_spans",
    "id_column": c, "text_column": t, "n": 20}`. Replaces the text
    column with the rewritten text (duplicated spans cut, canonical
    occurrence kept) and adds n_tokens/removed_tokens."""
    from ..functions.dedup import remove_duplicate_spans

    idc = params.get("id_column", "doc_id")
    txt = params.get("text_column", "text")

    def fn(df: DataFrame) -> DataFrame:
        out = remove_duplicate_spans(
            df, idc, txt, n=int(params.get("n", 20)), out_col="__clean"
        )
        return (
            df.join(out, idc)
            .drop(txt)
            .withColumnRenamed("__clean", txt)
        )

    return fn


def _op_blocklist_filter(params: Mapping, ctx) -> OpFn:
    """Badwords filter — `{"type": "blocklist_filter", "text_column": t,
    "blocklist": [...], "max_fraction": 0.01}`. Scores every doc and
    drops rows whose blocked-token fraction exceeds the cap (set
    "max_fraction": null to only annotate)."""
    from ..functions.text import blocklist_fraction

    def fn(df: DataFrame) -> DataFrame:
        out = blocklist_fraction(
            df,
            params.get("text_column", "text"),
            list(params["blocklist"]),
        )
        cap = params.get("max_fraction", 0.0)
        if cap is None:
            return out
        return out.filter(F.col("blocked_frac") <= float(cap))

    return fn


def _op_curriculum(params: Mapping, ctx) -> OpFn:
    """Curriculum phases — `{"type": "curriculum", "score_column": s,
    "id_column": c, "n_phases": 4, "n_buckets": 256}` (n_buckets
    engages the distributed exact rank; omit for the window path)."""
    from ..functions.sampling import curriculum_phases

    return lambda df: curriculum_phases(
        df,
        params["score_column"],
        params.get("id_column", "doc_id"),
        n_phases=int(params.get("n_phases", 4)),
        n_buckets=params.get("n_buckets"),
    )


def _op_pack_shards(params: Mapping, ctx) -> OpFn:
    """Token-budget shard packing — `{"type": "pack_shards",
    "order_column": c, "token_column": t, "budget": N,
    "n_buckets": 256}`."""
    from ..functions.sampling import pack_shards

    return lambda df: pack_shards(
        df,
        params["order_column"],
        params["token_column"],
        int(params["budget"]),
        n_buckets=params.get("n_buckets"),
    )


def _op_char_entropy(params: Mapping, ctx) -> OpFn:
    """Char-entropy quality signal — `{"type": "char_entropy",
    "id_column": c, "text_column": t, "min_bits": 2.5, "max_bits":
    null}`. Annotates n_chars/distinct_chars/entropy_bits (joined back
    on the id) and drops rows outside the [min_bits, max_bits] band;
    leave both bounds null to only annotate."""
    from ..functions.text import char_entropy

    idc = params.get("id_column", "doc_id")
    txt = params.get("text_column", "text")

    def fn(df: DataFrame) -> DataFrame:
        scored = char_entropy(df, idc, txt)
        # only add metric columns the frame doesn't already carry
        # (documents tables commonly ship their own n_chars)
        metrics = [
            c for c in ("n_chars", "distinct_chars", "entropy_bits")
            if c not in df.columns
        ]
        out = df.join(scored.select(idc, *metrics), idc)
        lo, hi = params.get("min_bits"), params.get("max_bits")
        if lo is not None:
            out = out.filter(F.col("entropy_bits") >= float(lo))
        if hi is not None:
            out = out.filter(F.col("entropy_bits") <= float(hi))
        return out

    return fn


def _op_centroid_score(params: Mapping, ctx) -> OpFn:
    """Seed-centroid cosine scoring — `{"type": "centroid_score",
    "id_column": c, "vector_column": v, "seed_filter": "<sql expr>",
    "min_cosine": 0.2}`. Adds centroid_cosine; drops rows below
    min_cosine when set."""
    from ..functions.similarity import centroid_similarity

    def fn(df: DataFrame) -> DataFrame:
        out = centroid_similarity(
            df,
            params.get("id_column", "vec_id"),
            params.get("vector_column", "embedding"),
            F.expr(params["seed_filter"]),
            dim=params.get("dim"),
        )
        mc = params.get("min_cosine")
        if mc is not None:
            out = out.filter(F.col("centroid_cosine") >= float(mc))
        return out

    return fn


def _op_winnowing(params: Mapping, ctx) -> OpFn:
    """Winnowing fingerprints — `{"type": "winnowing", "id_column": c,
    "text_column": t, "k": 8, "window": 4}`. Adds
    n_kgrams/fingerprints (joined back on the id)."""
    from ..functions.dedup import winnowing_fingerprints

    idc = params.get("id_column", "doc_id")

    def fn(df: DataFrame) -> DataFrame:
        fp = winnowing_fingerprints(
            df, idc, params.get("text_column", "text"),
            k=int(params.get("k", 8)),
            window=int(params.get("window", 4)),
        )
        return df.join(fp, idc)

    return fn


def _op_dhash(params: Mapping, ctx) -> OpFn:
    """Perceptual image hash — `{"type": "dhash", "content_column": c,
    "format_column": f, "max_bits": 56}`. Adds a BIGINT `dhash`
    column from the decoded pixels."""
    from ..operators.multimodal import dhash_images

    return lambda df: dhash_images(
        df,
        params.get("content_column", "content"),
        params.get("format_column", "format"),
        max_bits=int(params.get("max_bits", 56)),
    )


def _op_audio_fingerprint(params: Mapping, ctx) -> OpFn:
    """Audio energy-delta fingerprint — `{"type": "audio_fingerprint",
    "content_column": c, "format_column": f, "n_frames": 32}`. Adds a
    BIGINT `afp` column from the decoded waveform."""
    from ..operators.multimodal import audio_fingerprints

    return lambda df: audio_fingerprints(
        df,
        params.get("content_column", "content"),
        params.get("format_column", "format"),
        n_frames=int(params.get("n_frames", 32)),
    )


def _op_hamming_dedup(params: Mapping, ctx) -> OpFn:
    """Fingerprint dedup — `{"type": "hamming_dedup", "id_column": c,
    "hash_column": h, "bits": 56, "max_hamming": 3}`. Drops every row
    with a smaller-id neighbor inside the Hamming ball (banded bucket
    join, never all-pairs)."""
    from ..functions.dedup import hamming_hash_pairs

    idc = params.get("id_column", "doc_id")

    def fn(df: DataFrame) -> DataFrame:
        pairs = hamming_hash_pairs(
            df, idc, params["hash_column"],
            bits=int(params.get("bits", 56)),
            max_hamming=int(params.get("max_hamming", 3)),
            n_blocks=params.get("n_blocks"),
        )
        dups = pairs.select(F.col("id_b").alias(idc)).distinct()
        return df.join(dups, idc, "left_anti")

    return fn


def _op_pack_length_batches(params: Mapping, ctx) -> OpFn:
    """Padding-efficient dynamic batching — `{"type":
    "pack_length_batches", "id_column": c, "token_column": t,
    "batch_tokens": N, "n_shards": 32}`."""
    from ..functions.sampling import pack_length_batches

    return lambda df: pack_length_batches(
        df,
        params["id_column"],
        params["token_column"],
        int(params["batch_tokens"]),
        n_shards=int(params.get("n_shards", 32)),
    )


def _op_event_transitions(params: Mapping, ctx) -> OpFn:
    """Markov event transitions — `{"type": "event_transitions",
    "user_column": u, "type_column": t, "ts_column": ts,
    "tiebreak_column": id}`."""
    from ..operators.funnels import event_transitions

    return lambda df: event_transitions(
        df,
        user_col=params.get("user_column", "user_id"),
        type_col=params.get("type_column", "event_type"),
        ts_col=params.get("ts_column", "ts"),
        tiebreak_col=params.get("tiebreak_column"),
    )


def _op_top_paths(params: Mapping, ctx) -> OpFn:
    """Top user journeys — `{"type": "top_paths", "user_column": u,
    "type_column": t, "ts_column": ts, "max_steps": 5, "k": 20}`."""
    from ..operators.funnels import top_paths

    return lambda df: top_paths(
        df,
        user_col=params.get("user_column", "user_id"),
        type_col=params.get("type_column", "event_type"),
        ts_col=params.get("ts_column", "ts"),
        tiebreak_col=params.get("tiebreak_column"),
        max_steps=int(params.get("max_steps", 5)),
        k=int(params.get("k", 20)),
    )


def _op_grouped_ols(params: Mapping, ctx) -> OpFn:
    """Per-group OLS trend — `{"type": "grouped_ols", "group_columns":
    [...], "x_column": x, "y_column": y}`."""
    from ..operators.features import grouped_ols

    return lambda df: grouped_ols(
        df,
        list(params.get("group_columns", [])),
        params["x_column"],
        params["y_column"],
    )


def _op_diversity_sample(params: Mapping, ctx) -> OpFn:
    """Coverage sampling — `{"type": "diversity_sample", "id_column": c,
    "vector_column": v, "k_per_cell": 2, "n_cells": 8, "seed": 7}`.
    Keeps the k most-prototypical rows per codebook cell; annotates
    cell/proto_cos."""
    from ..functions.similarity import diversity_sample

    idc = params.get("id_column", "vec_id")

    def fn(df: DataFrame) -> DataFrame:
        sel = diversity_sample(
            df,
            k_per_cell=int(params.get("k_per_cell", 2)),
            id_col=idc,
            vec_col=params.get("vector_column", "embedding"),
            n_cells=int(params.get("n_cells", 8)),
            seed=int(params.get("seed", 7)),
            dim=params.get("dim"),
            assign=params.get("assign", "literal"),
        )
        return df.join(sel.select(idc, "cell", "proto_cos"), idc)

    return fn


def _op_threshold_sweep(params: Mapping, ctx) -> OpFn:
    """Calibration report — `{"type": "threshold_sweep", "score_column":
    s, "label_column": y, "n_thresholds": 20, "lo": 0.0, "hi": 1.0}`.
    Replaces the frame with the per-threshold precision/recall/F1
    table (aggregate-style op)."""
    from ..functions.profiling import threshold_sweep

    return lambda df: threshold_sweep(
        df,
        params["score_column"],
        params["label_column"],
        n_thresholds=int(params.get("n_thresholds", 20)),
        lo=float(params.get("lo", 0.0)),
        hi=float(params.get("hi", 1.0)),
    )


def _op_k_anonymity(params: Mapping, ctx) -> OpFn:
    """Privacy audit — `{"type": "k_anonymity", "quasi_columns": [...],
    "k": 5, "sensitive_column": s, "l": 2, "mode": "report"}`.
    mode "report" -> class table, "summary" -> one-row gate,
    "suppress" -> drop rows living in sub-k classes."""
    from ..functions.privacy import anonymity_summary, k_anonymity

    quasi = list(params["quasi_columns"])
    k = int(params.get("k", 5))
    mode = params.get("mode", "report")

    def fn(df: DataFrame) -> DataFrame:
        if mode == "summary":
            return anonymity_summary(df, quasi, k=k)
        classes = k_anonymity(
            df, quasi, k=k,
            sensitive_col=params.get("sensitive_column"),
            l=params.get("l"),
        )
        if mode == "suppress":
            ok = classes.filter(F.col("meets_k")).select(*quasi)
            return df.join(ok, quasi, "left_semi")
        return classes

    return fn


def _op_ks_drift(params: Mapping, ctx) -> OpFn:
    """Exact two-sample KS drift — `{"type": "ks_drift", "column": c,
    "side_a": "<sql predicate>", "side_b": "<sql predicate>",
    "n_buckets": 64}`. One scan builds both samples' value counts;
    output is the one-row (ks_stat, p_value, n_a, n_b, at_value)."""
    from ..functions.profiling import ks_drift_split

    def fn(df: DataFrame) -> DataFrame:
        return ks_drift_split(
            df, params["column"], params["side_a"], params["side_b"],
            n_buckets=int(params.get("n_buckets", 64)),
        )

    return fn


def _op_luhn_scan(params: Mapping, ctx) -> OpFn:
    """Luhn-verified PAN detection — `{"type": "luhn_scan",
    "column": c, "id_columns": [...]}`; emits masked candidates only."""
    from ..operators.cleaning import luhn_pan_scan

    def fn(df: DataFrame) -> DataFrame:
        return luhn_pan_scan(
            df, params["column"], id_cols=params.get("id_columns")
        )

    return fn


def _op_robust_outliers(params: Mapping, ctx) -> OpFn:
    """Median/MAD outlier filter — `{"type": "robust_outliers",
    "column": c, "threshold": 3.5}`; keeps flagged rows + robust_z."""
    from ..functions.profiling import robust_outliers_mad

    def fn(df: DataFrame) -> DataFrame:
        return robust_outliers_mad(
            df, params["column"],
            threshold=float(params.get("threshold", 3.5)),
        )

    return fn


def _op_bitext_mine(params: Mapping, ctx) -> OpFn:
    """Ratio-margin bitext mining — `{"type": "bitext_mine",
    "side_a": "<sql>", "side_b": "<sql>", "k": 4, "mutual": true,
    "id_column": ..., "vector_column": ..., "method": "auto"}`.
    Both sides are predicate slices of the incoming frame."""
    from ..functions.similarity import margin_bitext_mine

    def fn(df: DataFrame) -> DataFrame:
        return margin_bitext_mine(
            df.filter(params["side_a"]),
            df.filter(params["side_b"]),
            k=int(params.get("k", 4)),
            id_col=params.get("id_column", "vec_id"),
            vec_col=params.get("vector_column", "embedding"),
            mutual=bool(params.get("mutual", True)),
            method=params.get("method", "auto"),
        )

    return fn


def _op_gini(params: Mapping, ctx) -> OpFn:
    """Gini concentration — `{"type": "gini", "column": c,
    "group_by": [...]}`. Omit group_by for the distributed ungrouped
    kernel (bucketed prefix offsets, no single-partition window;
    eager one-row result). Optional "max_window_group" tunes the
    grouped size dispatch (rows above which groups route through the
    bucketed kernel instead of a per-group rank window; 0 forces the
    bucketed path, omit for the 4M default)."""
    from ..functions.profiling import gini_coefficient

    def fn(df: DataFrame) -> DataFrame:
        kw = {}
        if "max_window_group" in params:
            kw["max_window_group"] = float(params["max_window_group"])
        return gini_coefficient(
            df, params["column"], group_by=params.get("group_by"),
            n_buckets=int(params.get("n_buckets", 64)), **kw,
        )

    return fn


def _op_priority_sample(params: Mapping, ctx) -> OpFn:
    """Fixed-size deterministic uniform sample — `{"type":
    "priority_sample", "id_column": ..., "k": 1000, "seed": "s0"}`:
    keep the k rows with the smallest seeded hash priorities. Exact
    size (unlike rate-based `sample`), independent of partitioning and
    retries, mergeable across shards/streams (bottom-k semilattice)."""
    from ..functions.sampling import priority_sample

    def fn(df: DataFrame) -> DataFrame:
        return priority_sample(
            df,
            params.get("id_column", "doc_id"),
            int(params["k"]),
            seed=str(params.get("seed", "s0")),
            out_col=params.get("output_column", "priority"),
        )

    return fn


def _op_soft_dedup(params: Mapping, ctx) -> OpFn:
    """Soft deduplication — `{"type": "soft_dedup", "id_column": ...,
    "text_column": ..., "threshold": 0.7, "alpha": 1.0}`: minhash
    near-dup pairs over the frame's text, connected components, and a
    1/|cluster|^alpha training weight per row (unclustered rows weigh
    1.0) instead of dropping duplicates."""
    from ..functions.dedup import minhash_dedup_pairs, soft_dedup_weights

    def fn(df: DataFrame) -> DataFrame:
        idc = params.get("id_column", "doc_id")
        pairs = minhash_dedup_pairs(
            df.select(idc, params.get("text_column", "text")),
            idc, params.get("text_column", "text"),
            threshold=float(params.get("threshold", 0.7)),
        )
        return soft_dedup_weights(
            pairs, df, id_col=idc,
            alpha=float(params.get("alpha", 1.0)),
            out_col=params.get("output_column", "weight"),
        )

    return fn


def _op_bpe_encode(params: Mapping, ctx) -> OpFn:
    """Learned-BPE id-stream encode — `{"type": "bpe_encode",
    "column": text_col, "output_column": "bpe_ids", "merges": "32k",
    "with_sep": true}`. with_sep keeps word boundaries so the stream
    is invertible by bpe_detokenize."""
    from ..functions.tokenize import bpe_encode_ids, merges_32k

    def fn(df: DataFrame) -> DataFrame:
        merges = (
            merges_32k() if params.get("merges") == "32k" else None
        )
        return bpe_encode_ids(
            df, params["column"], merges=merges,
            out_col=params.get("output_column", "bpe_ids"),
            with_sep=bool(params.get("with_sep", True)),
        )

    return fn


def _op_bpe_detokenize(params: Mapping, ctx) -> OpFn:
    """Inverse of bpe_encode — `{"type": "bpe_detokenize",
    "column": ids_col, "output_column": "text_decoded",
    "merges": "32k"}`: id stream -> the tokenizer's normalized text."""
    from ..functions.tokenize import bpe_detokenize, merges_32k

    def fn(df: DataFrame) -> DataFrame:
        merges = (
            merges_32k() if params.get("merges") == "32k" else None
        )
        return bpe_detokenize(
            df, params["column"], merges=merges,
            out_col=params.get("output_column", "text_decoded"),
        )

    return fn


def _op_language_consistency(params: Mapping, ctx) -> OpFn:
    """Mixed-language audit — `{"type": "language_consistency",
    "id_column": ..., "column": text_col, "min_tokens": 3}`: per-doc
    segment-level language votes (majority, disagreement fraction)."""
    from ..functions.text import language_consistency

    def fn(df: DataFrame) -> DataFrame:
        return language_consistency(
            df, params.get("id_column", "doc_id"), params["column"],
            min_tokens=int(params.get("min_tokens", 3)),
        )

    return fn


OP_REGISTRY: dict[str, Callable[[Mapping, Any], OpFn]] = {
    "select": _op_select,
    "filter": _op_filter,
    "transform": _op_transform,
    "aggregate": _op_aggregate,
    "join": _op_join,
    "sort": _op_sort,
    "deduplicate": _op_deduplicate,
    "clean": _op_clean,
    "pivot": _op_pivot,
    "melt": _op_melt,
    "unpivot": _op_melt,
    "window": _op_window,
    "custom_sql": _op_custom_sql,
    "custom": _op_custom,
    "union": _op_union,
    "limit": _op_limit,
    "sample": _op_sample,
    "repartition": _op_repartition,
    "hash_sample": _op_hash_sample,
    "hash_split": _op_hash_split,
    "mixture_sample": _op_mixture_sample,
    "chunk": _op_chunk,
    "token_count": _op_token_count,
    "zorder": _op_zorder,
    "quantize_embeddings": _op_quantize_embeddings,
    "checkpoint": _op_checkpoint,
    "cap_per_key": _op_cap_per_key,
    "weighted_sample": _op_weighted_sample,
    "funnel": _op_funnel,
    "cohort_retention": _op_cohort_retention,
    "bm25": _op_bm25,
    "classifier_score": _op_classifier_score,
    "semantic_dedup": _op_semantic_dedup,
    "remove_duplicate_spans": _op_remove_duplicate_spans,
    "blocklist_filter": _op_blocklist_filter,
    "curriculum": _op_curriculum,
    "pack_shards": _op_pack_shards,
    "char_entropy": _op_char_entropy,
    "centroid_score": _op_centroid_score,
    "winnowing": _op_winnowing,
    "dhash": _op_dhash,
    "audio_fingerprint": _op_audio_fingerprint,
    "hamming_dedup": _op_hamming_dedup,
    "diversity_sample": _op_diversity_sample,
    "threshold_sweep": _op_threshold_sweep,
    "k_anonymity": _op_k_anonymity,
    "pack_length_batches": _op_pack_length_batches,
    "event_transitions": _op_event_transitions,
    "top_paths": _op_top_paths,
    "grouped_ols": _op_grouped_ols,
    "ks_drift": _op_ks_drift,
    "luhn_scan": _op_luhn_scan,
    "robust_outliers": _op_robust_outliers,
    "bitext_mine": _op_bitext_mine,
    "gini": _op_gini,
    "priority_sample": _op_priority_sample,
    "soft_dedup": _op_soft_dedup,
    "bpe_encode": _op_bpe_encode,
    "bpe_detokenize": _op_bpe_detokenize,
    "language_consistency": _op_language_consistency,
}


class CompileContext:
    """Resolves table names referenced by join/union ops and registered
    UDFs referenced by `custom` ops."""

    def __init__(
        self,
        tables: Mapping[str, DataFrame] | TableResolver | None = None,
        udfs: Mapping[str, Callable] | None = None,
    ):
        self._tables = tables
        self._udfs = dict(udfs or {})

    def resolve(self, name: str) -> DataFrame:
        if self._tables is None:
            raise ValueError(f"no table resolver configured (needed for {name!r})")
        if callable(self._tables):
            return self._tables(name)
        return self._tables[name]

    def resolve_udf(self, name: str) -> Callable:
        if name not in self._udfs:
            raise ValueError(
                f"UDF {name!r} is not registered; pass it via "
                "compile_ops(udfs={...}) — config strings are never eval'd"
            )
        return self._udfs[name]


def compile_ops(
    ops: list[Mapping],
    tables: Mapping[str, DataFrame] | TableResolver | None = None,
    udfs: Mapping[str, Callable] | None = None,
) -> OpFn:
    """Compile an operation list into one DataFrame->DataFrame closure.

    The composed closure builds a single lazy plan — no intermediate
    actions, so Catalyst optimizes across op boundaries.
    """
    ctx = CompileContext(tables, udfs)
    fns: list[OpFn] = []
    for op in ops:
        op_type = op.get("type")
        if op_type not in OP_REGISTRY:
            raise ValueError(f"unknown operation type: {op_type!r}")
        params = op.get("params", {k: v for k, v in op.items() if k != "type"})
        fns.append(OP_REGISTRY[op_type](params, ctx))

    def composed(df: DataFrame) -> DataFrame:
        for fn in fns:
            df = fn(df)
        return df

    return composed


def apply_ops(
    df: DataFrame,
    ops: list[Mapping],
    tables: Mapping[str, DataFrame] | TableResolver | None = None,
    udfs: Mapping[str, Callable] | None = None,
) -> DataFrame:
    """Convenience: compile and apply in one call."""
    return compile_ops(ops, tables, udfs)(df)
