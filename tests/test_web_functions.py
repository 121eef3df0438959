"""URL / domain curation: feature extraction, blocklists, rollups."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_framework_spark.functions.web import (
    domain_rollup,
    extract_url_features,
    filter_blocked_domains,
)

URLS = [
    (1, "https://news.example.co.uk/world/uk/story?id=9&ref=rss"),
    (2, "http://blog.foo.com/post"),
    (3, "https://example.org/"),
    (4, "http://192.168.10.4/admin"),
    (5, "https://WWW.Shop.Example.COM.AU/a/b/c/d"),
    (6, "http://spam.bad-site.net/p?q=1"),
    (7, "https://example.org/about"),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_extract_url_features(urls_df):
    out = {
        r["doc_id"]: r
        for r in extract_url_features(urls_df, "url").collect()
    }
    assert out[1]["url_registered_domain"] == "example.co.uk"
    assert out[1]["url_path_depth"] == 3
    assert out[1]["url_n_query_params"] == 2
    assert out[1]["url_is_https"] is True
    assert out[2]["url_registered_domain"] == "foo.com"
    assert out[2]["url_scheme"] == "http"
    assert out[3]["url_registered_domain"] == "example.org"
    assert out[3]["url_path_depth"] == 0
    assert out[4]["url_is_ip_host"] is True
    assert out[4]["url_registered_domain"] == "192.168.10.4"
    # case-normalized host; com.au is a two-level suffix -> last 3 labels
    assert out[5]["url_host"] == "www.shop.example.com.au"
    assert out[5]["url_registered_domain"] == "example.com.au"
    assert out[5]["url_path_depth"] == 4
    assert out[6]["url_registered_domain"] == "bad-site.net"
    assert out[6]["url_n_query_params"] == 1


def test_filter_blocked_domains_list(urls_df):
    kept = filter_blocked_domains(
        urls_df, "url", ["bad-site.net", "example.com.au"]
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 3, 4, 7]
    only_blocked = filter_blocked_domains(
        urls_df, "url", ["bad-site.net"], keep=True
    )
    assert [r["doc_id"] for r in only_blocked.collect()] == [6]


def test_filter_blocked_domains_dataframe(urls_df, spark):
    bl = spark.createDataFrame(
        [("BAD-SITE.NET",), ("example.org",)], "domain string"
    )
    kept = filter_blocked_domains(urls_df, "url", bl)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 4, 5]
    # broadcast anti-join, never a cartesian product
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_domain_rollup(urls_df):
    sized = urls_df.withColumn("n_chars", F.length("url"))
    out = {
        r["registered_domain"]: r
        for r in domain_rollup(sized, "url", ["n_chars"]).collect()
    }
    assert out["example.org"]["n_docs"] == 2
    assert out["example.org"]["n_hosts"] == 1
    assert out["example.co.uk"]["n_docs"] == 1
    assert out["example.org"]["sum_n_chars"] == len(URLS[2][1]) + len(URLS[6][1])
    filtered = domain_rollup(sized, "url", min_docs=2)
    assert [r["registered_domain"] for r in filtered.collect()] == ["example.org"]


def test_blocklist_unparseable_urls_null_safe(spark):
    # Rows whose URL fails to parse (null host -> null domain) must be
    # KEPT on keep=False and DROPPED on keep=True, identically for the
    # Python-list and DataFrame blocklist paths.
    rows = [
        (1, "https://spam.bad-site.net/x"),
        (2, "not a url at all"),
        (3, "https://example.org/ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl_list = ["bad-site.net"]
    bl_df = spark.createDataFrame([("bad-site.net",)], "domain string")

    kept_list = {r["doc_id"] for r in
                 filter_blocked_domains(df, "url", bl_list).collect()}
    kept_df = {r["doc_id"] for r in
               filter_blocked_domains(df, "url", bl_df).collect()}
    assert kept_list == kept_df == {2, 3}

    only_list = {r["doc_id"] for r in
                 filter_blocked_domains(df, "url", bl_list, keep=True).collect()}
    only_df = {r["doc_id"] for r in
               filter_blocked_domains(df, "url", bl_df, keep=True).collect()}
    assert only_list == only_df == {1}


def test_canonical_url_normalizations(spark):
    from data_pipeline_framework_spark.functions.web import canonical_url

    rows = [
        (1, "https://WWW.Example.com:443/a/b/?utm_source=x&b=2&a=1"),
        (2, "https://example.com/a/b?a=1&b=2"),
        (3, "http://example.com:8080/a/?ref=tw"),
        (4, "http://example.com:80/a"),
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonical_url("url").alias("c")).collect()}
    assert out[1] == out[2] == "https://example.com/a/b?a=1&b=2"
    assert out[3] == "http://example.com:8080/a"  # non-default port kept
    assert out[4] == "http://example.com/a"       # default port dropped
    assert out[5] is None                          # unparseable -> null


def test_dedup_by_canonical_url(spark):
    from data_pipeline_framework_spark.functions.web import (
        dedup_by_canonical_url,
    )

    rows = [
        (2, "https://example.com/a?x=1"),
        (1, "https://www.example.com/a/?x=1&fbclid=zz"),
        (3, "https://example.com/b"),
        (4, "garbage"),
        (5, "garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["is_canonical_dup"]
           for r in dedup_by_canonical_url(df, "url", "doc_id").collect()}
    assert out[1] is False and out[2] is True  # lowest id wins
    assert out[3] is False
    assert out[4] is False and out[5] is False  # nulls never dup

    deduped = dedup_by_canonical_url(
        df, "url", "doc_id", keep_all_columns=False)
    assert deduped.count() == 4
    assert "is_canonical_dup" not in deduped.columns
