"""URL-kernel goldens, ported verbatim from the reference's table-driven
tests (reference: internal/url/url_test.go:7-306). Covers the pure-Python
core, the Arrow pandas UDFs, and the native-expression twins."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from urlmap_spark.functions import urlcore as u
from urlmap_spark.functions import urlkernel as k

VALID_CASES = [
    ("http://example.com", True), ("https://example.com", True),
    ("https://example.com/path", True), ("https://example.com?query=value", True),
    ("https://example.com#fragment", True), ("https://example.com:8080", True),
    ("https://sub.example.com", True),
    ("", False), ("   ", False), ("example.com", False), ("ftp://example.com", False),
    ("file:///path", False), ("javascript:alert('test')", False),
    ("mailto:test@example.com", False), ("http://", False), ("http:///invalid", False),
]

DOMAIN_CASES = [
    ("http://example.com", "example.com"), ("https://example.com", "example.com"),
    ("https://example.com/path", "example.com"), ("https://example.com:8080", "example.com"),
    ("https://sub.example.com", "sub.example.com"),
    ("https://example.com?query=value", "example.com"),
    ("https://example.com#fragment", "example.com"),
    ("", None), ("   ", None), ("http://", None), ("http:///path", None), ("://invalid", None),
]

RESOLVE_CASES = [
    ("https://example.com", "/path", "https://example.com/path"),
    ("https://example.com/dir/", "file.html", "https://example.com/dir/file.html"),
    ("https://example.com/dir/subdir/", "../file.html", "https://example.com/dir/file.html"),
    ("https://example.com/dir/", "./file.html", "https://example.com/dir/file.html"),
    ("https://example.com", "?query=value", "https://example.com?query=value"),
    ("https://example.com", "#fragment", "https://example.com#fragment"),
    ("https://example.com", "https://other.com/path", "https://other.com/path"),
    ("", "/path", None), ("https://example.com", "", None),
    ("   ", "/path", None), ("https://example.com", "   ", None),
    ("://invalid", "/path", None),
]

NORMALIZE_CASES = [
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/path/", "https://example.com/path"),
    ("https://example.com/path#fragment", "https://example.com/path"),
    ("https://example.com/path?query=value#fragment", "https://example.com/path?query=value"),
    ("", None), ("   ", None), ("://invalid", None),
]

SAME_DOMAIN_CASES = [
    ("https://example.com", "https://example.com/path", True),
    ("http://example.com", "https://example.com", True),
    ("https://example.com:8080", "https://example.com:9090", True),
    ("https://example.com", "https://other.com", False),
    ("https://sub.example.com", "https://example.com", False),
    ("https://Example.COM", "https://example.com", True),
    ("invalid", "https://example.com", None),
    ("https://example.com", "invalid", None),
]

PREFIX_CASES = [
    ("https://example.com/docs/", "https://example.com/docs/", True),
    ("https://example.com/docs/", "https://example.com/docs/api/", True),
    ("https://example.com/docs/", "https://example.com/docs/api/v1/guide.html", True),
    ("https://example.com/docs", "https://example.com/docs/api/", True),
    ("https://example.com/docs/", "https://example.com/docs/api", True),
    ("https://example.com/docs", "https://example.com/docs/api", True),
    ("https://example.com/", "https://example.com/docs/", True),
    ("https://example.com/", "https://example.com/", True),
    ("https://example.com/docs/", "https://example.com/api/", False),
    ("https://example.com/docs/api/", "https://example.com/docs/", False),
    ("https://example.com/docs/", "https://example.com/documentation/", False),
    ("https://example.com/doc/", "https://example.com/docs/", False),
    ("https://example.com/docs/", "https://other.com/docs/", False),
    ("https://api.example.com/docs/", "https://example.com/docs/", False),
    ("invalid", "https://example.com/docs/", None),
    ("https://example.com/docs/", "invalid", None),
]

SKIP_CASES = [
    ("", True), ("   ", True), ("javascript:alert('test')", True),
    ("mailto:test@example.com", True), ("tel:+1234567890", True),
    ("ftp://example.com", True), ("file:///path", True),
    ("data:text/plain;base64,SGVsbG8=", True), ("#fragment", True),
    ("JAVASCRIPT:alert('test')", True),
    ("http://example.com", False), ("https://example.com", False),
    ("/path", False), ("./path", False), ("?query=value", False),
]


# --- pure-Python core -------------------------------------------------------

@pytest.mark.parametrize("raw,expected", VALID_CASES)
def test_is_valid_url(raw, expected):
    assert u.is_valid_url(raw) is expected


@pytest.mark.parametrize("raw,expected", DOMAIN_CASES)
def test_extract_domain(raw, expected):
    assert u.extract_domain(raw) == expected


@pytest.mark.parametrize("base,rel,expected", RESOLVE_CASES)
def test_resolve_url(base, rel, expected):
    assert u.resolve_url(base, rel) == expected


@pytest.mark.parametrize("raw,expected", NORMALIZE_CASES)
def test_normalize_url(raw, expected):
    assert u.normalize_url(raw) == expected


@pytest.mark.parametrize("a,b,expected", SAME_DOMAIN_CASES)
def test_is_same_domain(a, b, expected):
    assert u.is_same_domain(a, b) == expected


@pytest.mark.parametrize("base,target,expected", PREFIX_CASES)
def test_is_same_path_prefix(base, target, expected):
    assert u.is_same_path_prefix(base, target) == expected


@pytest.mark.parametrize("raw,expected", SKIP_CASES)
def test_should_skip_url(raw, expected):
    assert u.should_skip_url(raw) is expected


# --- Spark pandas UDFs + native twins ---------------------------------------

def test_spark_udfs_match_goldens(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"raw": [c[0] for c in VALID_CASES]})
    ).withColumn("valid_udf", k.is_valid_udf("raw")) \
     .withColumn("valid_expr", F.coalesce(k.is_valid_expr(F.col("raw")), F.lit(False)))
    for row, (raw, exp) in zip(df.collect(), VALID_CASES):
        assert row["valid_udf"] == exp, raw
        assert row["valid_expr"] == exp, f"native twin diverges on {raw!r}"


def test_spark_normalize_udf(spark):
    df = spark.createDataFrame(pd.DataFrame({"raw": [c[0] for c in NORMALIZE_CASES]}))
    out = df.withColumn("n", k.normalize_udf("raw")).collect()
    for row, (raw, exp) in zip(out, NORMALIZE_CASES):
        assert row["n"] == exp, raw


def test_native_normalize_twin_on_absolute_urls(spark):
    """normalize_simple_expr must agree with the UDF on already-absolute
    http(s) URLs (the crawl hot path universe)."""
    cases = [c[0] for c in NORMALIZE_CASES if c[1] is not None]
    cases += ["https://h.test/a/b/", "https://h.test/a?x=1#f", "http://H.test:8080/p/"]
    df = spark.createDataFrame(pd.DataFrame({"raw": cases}))
    out = df.select(
        "raw", k.normalize_udf("raw").alias("udf"),
        k.normalize_simple_expr(F.col("raw")).alias("expr"),
    ).collect()
    for row in out:
        assert row["udf"] == row["expr"], row["raw"]


def test_spark_resolve_udf(spark):
    good = [c for c in RESOLVE_CASES]
    df = spark.createDataFrame(pd.DataFrame(
        {"base": [c[0] for c in good], "rel": [c[1] for c in good]}))
    out = df.withColumn("r", k.resolve_udf("base", "rel")).collect()
    for row, (b, r, exp) in zip(out, good):
        assert row["r"] == exp, (b, r)


def test_spark_skip_and_domain_exprs(spark):
    df = spark.createDataFrame(pd.DataFrame({"raw": [c[0] for c in SKIP_CASES]}))
    out = df.withColumn("s", k.should_skip_expr(F.col("raw"))).collect()
    for row, (raw, exp) in zip(out, SKIP_CASES):
        assert row["s"] == exp, raw

    dd = [c for c in SAME_DOMAIN_CASES if c[2] is not None]
    df2 = spark.createDataFrame(pd.DataFrame(
        {"a": [c[0] for c in dd], "b": [c[1] for c in dd]}))
    out2 = df2.withColumn("s", k.same_domain_expr(F.col("a"), F.col("b"))).collect()
    for row, (a, b, exp) in zip(out2, dd):
        assert bool(row["s"]) == exp, (a, b)


def test_spark_path_prefix_expr(spark):
    pp = [c for c in PREFIX_CASES if c[2] is not None]
    df = spark.createDataFrame(pd.DataFrame(
        {"base": [c[0] for c in pp], "t": [c[1] for c in pp]}))
    out = df.withColumn("s", F.coalesce(
        k.same_path_prefix_expr(F.col("base"), F.col("t")), F.lit(False))).collect()
    for row, (b, t, exp) in zip(out, pp):
        assert bool(row["s"]) == exp, (b, t)


def test_canonical_outlink_pipeline(spark):
    """End-to-end per-href pipeline incl. duplicates and skip handling."""
    base = "https://example.com/category/electronics"
    hrefs = ["./laptop-1", "?page=2", "#reviews", "javascript:void(0)",
             "/absolute", "https://other.com/x", "  ", "../up"]
    expected = [
        u.canonical_outlink(base, h) for h in hrefs
    ]
    df = spark.createDataFrame(pd.DataFrame({"base": [base] * len(hrefs), "href": hrefs}))
    out = df.withColumn("c", k.canonical_outlink_udf("base", "href")).collect()
    assert [r["c"] for r in out] == expected
    # spot-check the ecommerce golden (reference: fixtures_test.go:71-108)
    assert expected[0] == "https://example.com/category/laptop-1"
