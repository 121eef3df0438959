"""URL / domain curation for web-scale corpora.

Web-crawl pipelines (C4, RefinedWeb, Gopher) filter and weight documents
by their source URL: blocklisted domains are dropped, per-domain quotas
cap over-represented hosts, and quality statistics are tracked at the
registered-domain level. The reference framework has no URL layer (its
sources are CSV/JSON/S3 files — reference src/data_pipeline/sources/);
this module is the corpus-curation generalization the 100 TB brief asks
for.

Scale shape: everything here is a pure column expression over Spark's
built-in ``parse_url`` (JVM, whole-stage codegen) — no UDFs, no
shuffles beyond the aggregations a rollup explicitly asks for.
Blocklists are applied as literal ``isin`` filters when small (pushed
into the scan) or broadcast anti-joins when passed as a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TWO_LEVEL_SUFFIXES",
    "url_features",
    "extract_url_features",
    "filter_blocked_domains",
    "domain_rollup",
]

# Common two-label public suffixes. A full public-suffix list would be
# shipped to executors as a broadcast lookup; this built-in core covers
# the dominant crawl TLDs and keeps the expression literal (codegen'd).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tw",
    "com.sg", "co.za", "com.ar", "com.tr",
)

_IP_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def _registered_domain(host: Column) -> Column:
    """eTLD+1 from a hostname: last two labels, or last three when the
    last two form a known two-level public suffix; IP hosts pass
    through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    suffix_hit = last2.isin(*TWO_LEVEL_SUFFIXES)
    return (
        F.when(host.rlike(_IP_RE), host)
        .when(n <= 2, host)
        .when(suffix_hit & (n >= 3), last3)
        .otherwise(last2)
    )


def url_features(url: Column | str) -> dict[str, Column]:
    """Column expressions for the standard URL curation features.

    Returns a dict so callers can pick fields without forcing a full
    projection; all expressions share the single parsed column and stay
    inside one codegen stage.
    """
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.parse_url(u, F.lit("PATH"))
    query = F.parse_url(u, F.lit("QUERY"))
    return {
        "scheme": F.lower(F.parse_url(u, F.lit("PROTOCOL"))),
        "host": host,
        "registered_domain": _registered_domain(host),
        "path": path,
        "path_depth": F.when(
            (path.isNull()) | (path == "") | (path == "/"), F.lit(0)
        ).otherwise(F.size(F.split(F.regexp_replace(path, "^/|/$", ""), "/"))),
        "n_query_params": F.when(
            query.isNull() | (query == ""), F.lit(0)
        ).otherwise(F.size(F.split(query, "&"))),
        "is_https": (F.lower(F.parse_url(u, F.lit("PROTOCOL"))) == "https"),
        "is_ip_host": host.rlike(_IP_RE),
    }


def extract_url_features(
    df: DataFrame, url_col: str, prefix: str = "url_"
) -> DataFrame:
    """Append the URL feature columns (``{prefix}scheme``,
    ``{prefix}host``, ``{prefix}registered_domain``,
    ``{prefix}path_depth``, ``{prefix}n_query_params``,
    ``{prefix}is_https``, ``{prefix}is_ip_host``) to ``df``.

    One projection, zero shuffles; safe in the scan stage of any plan.
    """
    feats = url_features(url_col)
    out = df
    for name in (
        "scheme",
        "host",
        "registered_domain",
        "path_depth",
        "n_query_params",
        "is_https",
        "is_ip_host",
    ):
        out = out.withColumn(prefix + name, feats[name])
    return out


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked: list[str] | DataFrame,
    keep: bool = False,
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist (or keep
    ONLY those rows with ``keep=True``, for audit queries).

    Small Python-list blocklists become a literal ``isin`` predicate —
    Catalyst folds it into the scan filter. DataFrame blocklists (one
    ``domain`` column) become a broadcast left-anti (or left-semi) join
    so a million-domain blocklist never round-trips the driver.
    """
    dom = _registered_domain(F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))))
    if isinstance(blocked, DataFrame):
        tagged = df.withColumn("__dom", dom)
        bl = blocked.select(F.lower(F.col("domain")).alias("__dom")).distinct()
        how = "left_semi" if keep else "left_anti"
        return tagged.join(F.broadcast(bl), "__dom", how).drop("__dom")
    domains = [d.lower() for d in blocked]
    # NULL-safe: a URL whose host fails to parse yields a NULL domain and
    # a NULL isin() result. Coalesce to False so unparseable rows are KEPT
    # on keep=False (matching the anti-join path, where null keys never
    # match) and DROPPED on keep=True (they are not on the blocklist).
    pred = F.coalesce(
        dom.isin(*domains) if domains else F.lit(False), F.lit(False)
    )
    return df.filter(pred if keep else ~pred)


def domain_rollup(
    df: DataFrame,
    url_col: str,
    metric_cols: list[str] | None = None,
    min_docs: int = 1,
) -> DataFrame:
    """Per-registered-domain corpus statistics: document count, distinct
    hosts, mean/sum of each metric column. One hash aggregation with
    map-side partials; output cardinality is the domain count, so the
    shuffle is tiny relative to the corpus even at 100 TB.
    """
    feats = url_features(url_col)
    base = df.withColumn("__dom", feats["registered_domain"]).withColumn(
        "__host", feats["host"]
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__host").alias("n_hosts"),
    ]
    for m in metric_cols or []:
        aggs.append(F.avg(m).alias(f"avg_{m}"))
        aggs.append(F.sum(m).alias(f"sum_{m}"))
    out = base.groupBy(F.col("__dom").alias("registered_domain")).agg(*aggs)
    if min_docs > 1:
        out = out.filter(F.col("n_docs") >= min_docs)
    return out


_TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src"
    r"|igshid|spm|yclid|_ga)="
)


def canonical_url(url_col: str | Column) -> Column:
    """Crawl-dedup URL canonicalization as one codegen expression chain:

    - scheme and host lowercased; a leading ``www.`` stripped
    - default ports dropped (``:80`` for http, ``:443`` for https)
    - fragment dropped (parse_url never returns it)
    - tracking params removed (utm_*, gclid, fbclid, msclkid, mc_cid,
      mc_eid, ref, ref_src, igshid, spm, yclid, _ga)
    - remaining query params sorted byte-wise, so param order never
      distinguishes two URLs
    - trailing ``/`` on the path stripped

    Pure column expressions (the per-URL param arrays are tiny, so the
    interpreted higher-order filter is noise); pair with
    dedup_by_canonical_url for the corpus-level keep decision.
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    # parse_url HOST excludes the port; take it from AUTHORITY
    auth = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    hostport = F.when(
        keep_port, F.concat(host, F.lit(":"), port)
    ).otherwise(host)
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    query = F.parse_url(u, F.lit("QUERY"))
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "")
            & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def dedup_by_canonical_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    keep_all_columns: bool = True,
) -> DataFrame:
    """Keep one row per canonical URL — the lowest id wins (crawls
    revisit the same page under tracking-param variants; dedup BEFORE
    text processing so downstream never pays for the copies).

    One row_number window keyed on the canonical form (a single hash
    shuffle on that key); rows whose URL fails to parse (null host)
    canonicalize to null and are all kept — an unparseable URL is not
    evidence of duplication.

    Output: the input columns plus canonical_url and is_canonical_dup
    (true on every dropped-equivalent row when keep_all_columns, or a
    deduped frame when not).
    """
    from pyspark.sql.window import Window

    tagged = df.withColumn("canonical_url", canonical_url(url_col))
    w = Window.partitionBy("canonical_url").orderBy(F.asc(id_col))
    flagged = tagged.withColumn(
        "is_canonical_dup",
        F.when(
            F.col("canonical_url").isNull(), F.lit(False)
        ).otherwise(F.row_number().over(w) > 1),
    )
    if keep_all_columns:
        return flagged
    return flagged.filter(~F.col("is_canonical_dup")).drop(
        "is_canonical_dup"
    )
