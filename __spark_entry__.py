"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises the engine in
``data_pipeline_framework_spark`` (op-DSL compiler, window library, …) and
has a DuckDB oracle in ``oracle_sql()`` with IDENTICAL output column names.
Float aggregates are rounded on BOTH sides so cross-engine summation-order
noise cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_framework_spark import apply_ops
from data_pipeline_framework_spark.operators import window_ops as W
from data_pipeline_framework_spark.sources import read_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _r(col, k: int = 4):
    """Tie-stable rounding: floor(x*10^k + 0.5)/10^k evaluated in double
    arithmetic. Spark's round() (BigDecimal HALF_UP on the binary expansion)
    and DuckDB's round() (std::round after scaling) disagree on exact decimal
    ties (e.g. 42.38625 -> 42.3862 vs 42.3863); this formula runs the same
    IEEE ops in both engines, so division-derived values hash-match.
    SQL twin: FLOOR(x * 1eK + 0.5) / 1eK.
    """
    scale = 10 ** k
    return F.floor(col * scale + F.lit(0.5)) / scale


# ---------------------------------------------------------------------------
# relational core (op-DSL compiler)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 expressed in the op DSL: filter -> grouped agg -> sort."""
    li = _t(spark, sf_dir, "lineitem")
    out = apply_ops(
        li,
        [
            {"type": "filter", "condition": "l_shipdate <= TIMESTAMP '1998-09-02'"},
            {
                "type": "aggregate",
                "group_by": ["l_returnflag", "l_linestatus"],
                "aggregations": {
                    "l_quantity": ["sum", "avg"],
                    "l_extendedprice": ["sum", "avg"],
                    "l_discount": ["avg"],
                    "l_orderkey": ["count"],
                },
            },
            {"type": "sort", "by": ["l_returnflag", "l_linestatus"]},
        ],
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity_sum", 2).alias("sum_qty"),
        F.round("l_extendedprice_sum", 2).alias("sum_base_price"),
        F.round("l_quantity_avg", 4).alias("avg_qty"),
        F.round("l_extendedprice_avg", 4).alias("avg_price"),
        F.round("l_discount_avg", 6).alias("avg_disc"),
        F.col("l_orderkey_count").alias("count_order"),
    )


def select_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select/exclude + rename/cast/calculate/string ops through the DSL."""
    part = _t(spark, sf_dir, "part")
    return apply_ops(
        part,
        [
            {"type": "select", "exclude": ["p_brand"]},
            {
                "type": "transform",
                "transformations": [
                    {"type": "rename", "mapping": {"p_retailprice": "retail_price"}},
                    {"type": "cast", "columns": {"p_size": "bigint"}},
                    {
                        "type": "calculate",
                        "column": "price_per_size",
                        "expression": "round(retail_price / (p_size + 1), 4)",
                    },
                    {
                        "type": "string_operations",
                        "columns": ["p_type"],
                        "operations": ["lower", "trim"],
                    },
                    {
                        "type": "regex_extract",
                        "column": "p_name",
                        "pattern": "([a-z]+)$",
                        "group": 1,
                        "new_column": "last_word",
                    },
                ],
            },
            {"type": "filter", "filters": [
                {"column": "p_size", "operator": ">=", "value": 10},
            ]},
        ],
    ).select(
        "p_partkey", "p_name", "p_type", "p_size",
        F.round("retail_price", 2).alias("retail_price"),
        "price_per_size", "last_word",
    )


def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column/op/value predicate vocabulary: in / not_in / contains /
    starts_with / between."""
    cust = _t(spark, sf_dir, "customer")
    return apply_ops(
        cust,
        [
            {
                "type": "filter",
                "filters": [
                    {"column": "c_mktsegment", "operator": "in",
                     "value": ["BUILDING", "AUTOMOBILE", "MACHINERY"]},
                    {"column": "c_mktsegment", "operator": "not_in",
                     "value": ["MACHINERY"]},
                    {"column": "c_name", "operator": "contains", "value": "1"},
                    {"column": "c_name", "operator": "starts_with",
                     "value": "Customer"},
                    {"column": "c_acctbal", "operator": "between",
                     "value": [0.0, 8000.0]},
                ],
            },
        ],
    ).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract_date_parts naming convention `{col}_year/_month/_day/_weekday`
    (reference pandas_processor.py:129-138); weekday is Mon=0."""
    orders = _t(spark, sf_dir, "orders")
    return apply_ops(
        orders,
        [
            {
                "type": "transform",
                "transformations": [
                    {"type": "extract_date_parts", "column": "o_orderdate",
                     "parts": ["year", "month", "day", "weekday", "quarter"]},
                ],
            },
            {"type": "select", "columns": [
                "o_orderkey", "o_orderdate_year", "o_orderdate_month",
                "o_orderdate_day", "o_orderdate_weekday", "o_orderdate_quarter",
            ]},
        ],
    )


def grouped_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`{col}_{func}` naming over multiple funcs per column + countDistinct."""
    li = _t(spark, sf_dir, "lineitem")
    out = apply_ops(
        li,
        [
            {
                "type": "aggregate",
                "group_by": ["l_returnflag"],
                "aggregations": {
                    "l_quantity": ["sum", "mean", "min", "max"],
                    "l_extendedprice": ["count"],
                    "l_suppkey": ["nunique"],
                },
            },
        ],
    )
    return out.select(
        "l_returnflag",
        F.round("l_quantity_sum", 2).alias("l_quantity_sum"),
        F.round("l_quantity_mean", 4).alias("l_quantity_mean"),
        F.round("l_quantity_min", 2).alias("l_quantity_min"),
        F.round("l_quantity_max", 2).alias("l_quantity_max"),
        "l_extendedprice_count",
        "l_suppkey_nunique",
    )


def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregations without group_by -> single row."""
    orders = _t(spark, sf_dir, "orders")
    out = apply_ops(
        orders,
        [
            {
                "type": "aggregate",
                "aggregations": {
                    "o_totalprice": ["sum", "mean", "min", "max"],
                    "o_orderkey": ["count", "nunique"],
                },
            },
        ],
    )
    return out.select(
        F.round("o_totalprice_sum", 2).alias("o_totalprice_sum"),
        F.round("o_totalprice_mean", 4).alias("o_totalprice_mean"),
        F.round("o_totalprice_min", 2).alias("o_totalprice_min"),
        F.round("o_totalprice_max", 2).alias("o_totalprice_max"),
        "o_orderkey_count",
        "o_orderkey_nunique",
    )


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter, grouped revenue, top-10.
    Deterministic top-k: revenue DESC then key ASC."""
    tables = {n: _t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem")}
    out = apply_ops(
        tables["lineitem"],
        tables=tables,
        ops=
        [
            {"type": "join", "right": "orders",
             "condition": "l_orderkey = o_orderkey", "how": "inner"},
            {"type": "join", "right": "customer",
             "condition": "o_custkey = c_custkey", "how": "inner",
             "broadcast": True},
            {"type": "filter",
             "condition": "c_mktsegment = 'BUILDING' "
                          "AND o_orderdate < TIMESTAMP '1998-03-15' "
                          "AND l_shipdate > TIMESTAMP '1995-03-15'"},
            {
                "type": "aggregate",
                "group_by": ["l_orderkey", "o_orderdate"],
                "aggregations": {"l_extendedprice": ["sum"]},
            },
        ],
    )
    return (
        out.select(
            "l_orderkey",
            F.round("l_extendedprice_sum", 2).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with broadcast dimension tables."""
    names = ("region", "nation", "customer", "supplier", "orders", "lineitem")
    t = {n: _t(spark, sf_dir, n) for n in names}
    out = apply_ops(
        t["lineitem"],
        [
            {"type": "join", "right": "orders",
             "condition": "l_orderkey = o_orderkey"},
            {"type": "join", "right": "customer",
             "condition": "o_custkey = c_custkey", "broadcast": True},
            {"type": "join", "right": "supplier",
             "condition": "l_suppkey = s_suppkey AND c_nationkey = s_nationkey",
             "broadcast": True},
            {"type": "join", "right": "nation",
             "condition": "s_nationkey = n_nationkey", "broadcast": True},
            {"type": "join", "right": "region",
             "condition": "n_regionkey = r_regionkey", "broadcast": True},
            {"type": "filter",
             "condition": "r_name = 'ASIA' "
                          "AND o_orderdate >= TIMESTAMP '1996-01-01' "
                          "AND o_orderdate < TIMESTAMP '1999-01-01'"},
            {
                "type": "aggregate",
                "group_by": ["n_name"],
                "aggregations": {"l_extendedprice": ["sum"], "l_orderkey": ["count"]},
            },
            {"type": "sort", "by": ["n_name"]},
        ],
        tables=t,
    )
    return out.select(
        "n_name",
        F.round("l_extendedprice_sum", 2).alias("revenue"),
        F.col("l_orderkey_count").alias("n_items"),
    )


def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deduplicate keep='first' with deterministic ordering -> row_number
    window (reference drop_duplicates keep semantics)."""
    orders = _t(spark, sf_dir, "orders")
    return apply_ops(
        orders,
        [
            {"type": "deduplicate", "subset": ["o_custkey"], "keep": "first",
             "order_by": ["o_orderdate", "o_orderkey"]},
            {"type": "select", "columns": ["o_custkey", "o_orderkey", "o_orderdate"]},
        ],
    )


def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi-column sort with per-column direction + limit."""
    li = _t(spark, sf_dir, "lineitem")
    out = apply_ops(
        li,
        [
            {"type": "sort", "by": ["l_extendedprice", "l_orderkey", "l_linenumber"],
             "ascending": [False, True, True]},
            {"type": "limit", "n": 25},
        ],
    )
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
    )


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing-column fill (pandas-concat alignment)."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter("c_mktsegment = 'BUILDING'").select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    b = cust.filter("c_mktsegment = 'MACHINERY'").select(
        "c_custkey", "c_mktsegment"
    )
    return apply_ops(a, [{"type": "union", "other": b, "by_name": True}])


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect + except: nations having customers but no suppliers."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    c_nations = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s_nations = supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c_nations.exceptAll(s_nations).orderBy("nationkey")


def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_by without aggregations -> per-group count."""
    orders = _t(spark, sf_dir, "orders")
    return apply_ops(orders, [{"type": "aggregate", "group_by": ["o_orderpriority"]}])


def custom_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """custom_sql op: temp view + arbitrary Spark SQL."""
    li = _t(spark, sf_dir, "lineitem")
    return apply_ops(
        li,
        [
            {
                "type": "custom_sql",
                "view_name": "li",
                "query": """
                    SELECT l_returnflag,
                           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                               AS disc_revenue,
                           COUNT(*) AS n
                    FROM li
                    WHERE l_quantity > 25
                    GROUP BY l_returnflag
                """,
            },
            {"type": "sort", "by": ["l_returnflag"]},
        ],
    )


# ---------------------------------------------------------------------------
# window functions (operators/window_ops.py)


def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/percent_rank/ntile/cume_dist; deterministic
    via unique (o_totalprice DESC, o_orderkey ASC) order."""
    orders = _t(spark, sf_dir, "orders")
    df = orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
    part, order = ["o_orderpriority"], ["o_totalprice", "o_orderkey"]
    desc = [True, False]
    df = W.row_number(df, partition_by=part, order_by=order, descending=desc,
                      new_column="rn")
    df = W.rank(df, partition_by=part, order_by=order, descending=desc,
                new_column="rnk")
    df = W.dense_rank(df, partition_by=part, order_by=order, descending=desc,
                      new_column="drnk")
    df = W.percent_rank(df, partition_by=part, order_by=order, descending=desc,
                        new_column="prnk")
    df = W.cume_dist(df, partition_by=part, order_by=order, descending=desc,
                     new_column="cdist")
    df = W.ntile(df, 4, partition_by=part, order_by=order, descending=desc,
                 new_column="quartile")
    return df.select(
        "o_orderkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "rn", "rnk", "drnk",
        _r(F.col("prnk"), 6).alias("prnk"),
        _r(F.col("cdist"), 6).alias("cdist"),
        "quartile",
    )


def window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value/nth_value per user over event time."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    part, order = ["user_id"], ["ts", "event_id"]
    df = W.lag(ev, "value", periods=1, partition_by=part, order_by=order)
    df = W.lead(df, "value", periods=2, partition_by=part, order_by=order)
    df = W.first_value(df, "value", partition_by=part, order_by=order)
    df = W.last_value(df, "value", partition_by=part, order_by=order)
    df = W.nth_value(df, "value", 3, partition_by=part, order_by=order)
    return df.select(
        "event_id", "user_id",
        F.round("value", 2).alias("value"),
        F.round("value_lag_1", 2).alias("value_lag_1"),
        F.round("value_lead_2", 2).alias("value_lead_2"),
        F.round("value_first_value", 2).alias("value_first"),
        F.round("value_last_value", 2).alias("value_last"),
        F.round("value_nth_3", 2).alias("value_nth_3"),
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """running_sum/running_average + moving_average/moving_sum frames.

    Averages are re-derived as round(sum,2)/count so the oracle comparison
    is immune to cross-engine float-accumulation noise at round() ties.
    """
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    part, order = ["user_id"], ["ts", "event_id"]
    df = W.running_sum(ev, "value", partition_by=part, order_by=order)
    df = W.moving_sum(df, "value", window=3, partition_by=part, order_by=order)
    df = W.moving_sum(df, "value", window=5, partition_by=part, order_by=order,
                      new_column="value_moving_sum_5")
    df = W.apply_window_function(
        df, "count", column="value", partition_by=part, order_by=order,
        rows_between=(None, 0), new_column="n_run")
    df = W.apply_window_function(
        df, "count", column="value", partition_by=part, order_by=order,
        rows_between=(-4, 0), new_column="n_5")
    return df.select(
        "event_id", "user_id",
        F.round("value_running_sum", 4).alias("running_sum"),
        _r(F.round("value_running_sum", 2) / F.col("n_run"), 4).alias(
            "running_avg"),
        _r(F.round("value_moving_sum_5", 2) / F.col("n_5"), 4).alias(
            "moving_avg_5"),
        F.round("value_moving_sum_3", 4).alias("moving_sum_3"),
    )


# ---------------------------------------------------------------------------
# reshaping


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot with explicit pivot_values (no distinct-scan)."""
    orders = _t(spark, sf_dir, "orders")
    out = apply_ops(
        orders,
        [
            {"type": "pivot", "index": ["o_orderpriority"],
             "columns": "o_orderstatus", "values": ["o_totalprice"],
             "aggfunc": "sum", "pivot_values": ["F", "O", "P"]},
            {"type": "sort", "by": ["o_orderpriority"]},
        ],
    )
    return out.select(
        "o_orderpriority",
        F.round("F", 2).alias("F"),
        F.round("O", 2).alias("O"),
        F.round("P", 2).alias("P"),
    )


def melt_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt/unpivot wide->long (native df.unpivot)."""
    part = _t(spark, sf_dir, "part")
    return apply_ops(
        part,
        [
            {"type": "transform", "transformations": [
                {"type": "cast", "columns": {"p_size": "double"}},
            ]},
            {"type": "melt", "id_vars": ["p_partkey"],
             "value_vars": ["p_size", "p_retailprice"],
             "var_name": "measure", "value_name": "val"},
        ],
    ).select("p_partkey", "measure", F.round("val", 2).alias("val"))


def rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — the reference's pivot_with_subtotals semantics
    (reference pivot_operations.py:215-282) in one pass."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over returnflag x linestatus."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 through the op-DSL compiler at sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "select_transform": select_transform,
        "filter_predicates": filter_predicates,
        "date_parts": date_parts,
        "grouped_agg_multi": grouped_agg_multi,
        "global_agg": global_agg,
        "q3_top_revenue_orders": q3_top_revenue_orders,
        "q5_regional_revenue": q5_regional_revenue,
        "dedup_first_per_key": dedup_first_per_key,
        "sort_topk": sort_topk,
        "union_by_name": union_by_name,
        "set_ops": set_ops,
        "group_count": group_count,
        "custom_sql_passthrough": custom_sql_passthrough,
        "window_ranking": window_ranking,
        "window_offsets": window_offsets,
        "window_running": window_running,
        "pivot_status": pivot_status,
        "melt_part": melt_part,
        "rollup_subtotals": rollup_subtotals,
        "cube_agg": cube_agg,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)        AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2)   AS sum_base_price,
                   ROUND(AVG(l_quantity), 4)        AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4)   AS avg_price,
                   ROUND(AVG(l_discount), 6)        AS avg_disc,
                   COUNT(l_orderkey)                AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "select_transform": """
            SELECT p_partkey, p_name,
                   TRIM(LOWER(p_type)) AS p_type,
                   CAST(p_size AS BIGINT) AS p_size,
                   ROUND(p_retailprice, 2) AS retail_price,
                   ROUND(p_retailprice / (p_size + 1), 4) AS price_per_size,
                   COALESCE(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word
            FROM part
            WHERE p_size >= 10
        """,
        "filter_predicates": """
            SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                   ROUND(c_acctbal, 2) AS c_acctbal
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
              AND c_mktsegment NOT IN ('MACHINERY')
              AND c_name LIKE '%1%'
              AND c_name LIKE 'Customer%'
              AND c_acctbal BETWEEN 0.0 AND 8000.0
        """,
        "date_parts": """
            SELECT o_orderkey,
                   CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS o_orderdate_year,
                   CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_orderdate_month,
                   CAST(EXTRACT(day FROM o_orderdate) AS INT)   AS o_orderdate_day,
                   CAST(EXTRACT(isodow FROM o_orderdate) - 1 AS INT)
                       AS o_orderdate_weekday,
                   CAST(EXTRACT(quarter FROM o_orderdate) AS INT)
                       AS o_orderdate_quarter
            FROM orders
        """,
        "grouped_agg_multi": """
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity), 2)  AS l_quantity_sum,
                   ROUND(AVG(l_quantity), 4)  AS l_quantity_mean,
                   ROUND(MIN(l_quantity), 2)  AS l_quantity_min,
                   ROUND(MAX(l_quantity), 2)  AS l_quantity_max,
                   COUNT(l_extendedprice)     AS l_extendedprice_count,
                   COUNT(DISTINCT l_suppkey)  AS l_suppkey_nunique
            FROM lineitem GROUP BY l_returnflag
        """,
        "global_agg": """
            SELECT ROUND(SUM(o_totalprice), 2)  AS o_totalprice_sum,
                   ROUND(AVG(o_totalprice), 4)  AS o_totalprice_mean,
                   ROUND(MIN(o_totalprice), 2)  AS o_totalprice_min,
                   ROUND(MAX(o_totalprice), 2)  AS o_totalprice_max,
                   COUNT(o_orderkey)            AS o_orderkey_count,
                   COUNT(DISTINCT o_orderkey)   AS o_orderkey_nunique
            FROM orders
        """,
        "q3_top_revenue_orders": """
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice), 2) AS revenue,
                   o_orderdate
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate  > TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_regional_revenue": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice), 2) AS revenue,
                   COUNT(l_orderkey) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1999-01-01'
            GROUP BY n_name
            ORDER BY n_name
        """,
        "dedup_first_per_key": """
            SELECT o_custkey, o_orderkey, o_orderdate FROM (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders
            ) WHERE rn = 1
        """,
        "sort_topk": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice, 2) AS l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
            LIMIT 25
        """,
        "union_by_name": """
            SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal
            FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT c_custkey, c_mktsegment, NULL AS c_acctbal
            FROM customer WHERE c_mktsegment = 'MACHINERY'
        """,
        "set_ops": """
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
            ORDER BY nationkey
        """,
        "group_count": """
            SELECT o_orderpriority, COUNT(*) AS count
            FROM orders GROUP BY o_orderpriority
        """,
        "custom_sql_passthrough": """
            SELECT l_returnflag,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS disc_revenue,
                   COUNT(*) AS n
            FROM lineitem
            WHERE l_quantity > 25
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "window_ranking": """
            SELECT o_orderkey, o_orderpriority,
                   ROUND(o_totalprice, 2) AS o_totalprice,
                   CAST(ROW_NUMBER() OVER w AS INT) AS rn,
                   CAST(RANK() OVER w AS INT) AS rnk,
                   CAST(DENSE_RANK() OVER w AS INT) AS drnk,
                   FLOOR(PERCENT_RANK() OVER w * 1e6 + 0.5) / 1e6 AS prnk,
                   FLOOR(CUME_DIST() OVER w * 1e6 + 0.5) / 1e6 AS cdist,
                   CAST(NTILE(4) OVER w AS INT) AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        """,
        "window_offsets": """
            SELECT event_id, user_id,
                   ROUND(value, 2) AS value,
                   ROUND(LAG(value, 1) OVER w, 2)  AS value_lag_1,
                   ROUND(LEAD(value, 2) OVER w, 2) AS value_lead_2,
                   ROUND(FIRST_VALUE(value) OVER w, 2) AS value_first,
                   ROUND(LAST_VALUE(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING), 2) AS value_last,
                   ROUND(NTH_VALUE(value, 3) OVER w, 2) AS value_nth_3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "window_running": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER w_run, 4) AS running_sum,
                   FLOOR(ROUND(SUM(value) OVER w_run, 2)
                         / COUNT(value) OVER w_run * 1e4 + 0.5) / 1e4
                       AS running_avg,
                   FLOOR(ROUND(SUM(value) OVER w5, 2)
                         / COUNT(value) OVER w5 * 1e4 + 0.5) / 1e4
                       AS moving_avg_5,
                   ROUND(SUM(value) OVER w3, 4)    AS moving_sum_3
            FROM events
            WINDOW
              w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              w5 AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
              w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "pivot_status": """
            SELECT o_orderpriority,
                   ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
                       AS "F",
                   ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
                       AS "O",
                   ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
                       AS "P"
            FROM orders GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "melt_part": """
            SELECT p_partkey, 'p_size' AS measure,
                   ROUND(CAST(p_size AS DOUBLE), 2) AS val
            FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice' AS measure,
                   ROUND(p_retailprice, 2) AS val
            FROM part
        """,
        "rollup_subtotals": """
            SELECT o_orderpriority, o_orderstatus,
                   ROUND(SUM(o_totalprice), 2) AS total,
                   COUNT(*) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        "cube_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
    }
