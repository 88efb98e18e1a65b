"""Extraction stats, SPA host profile, crawl stats, lenient validation."""

import pandas as pd
from pyspark.sql import functions as F

from urlmap_spark.functions.urlkernel import lenient_fix_expr, lenient_valid_expr
from urlmap_spark.operators.stats import crawl_stats, extraction_stats, host_profile
from urlmap_spark.sources.corpus import CORPUS_COLUMNS


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, caption string")


def test_extraction_stats_classes(spark):
    pages = _pages(spark, [(
        "https://h.test/base",
        'href="" href="javascript:x" href="https://h.test/ok" href="./rel" '
        'href="mailto:a@b" href="https://" href="#f"',
    )])
    out = {r["outcome"]: r["n"] for r in extraction_stats(pages).collect()}
    assert out.get("empty_href") == 1
    assert out.get("filtered_out") == 3      # javascript:, mailto:, #f
    assert out.get("valid") == 1             # https://h.test/ok
    assert out.get("relative_resolved") == 1 # ./rel
    assert out.get("invalid_after_resolution") == 1  # https:// (no host)
    assert sum(out.values()) == 7


def test_host_profile_weights(spark):
    spa_cap = 'react app id="root" loading spinner href="/a"'
    plain_cap = " ".join(f'href="/p{i}"' for i in range(12)) + " plain text"
    rows = [(f"https://spa.test/p{i}", spa_cap) for i in range(4)]
    rows += [(f"https://plain.test/p{i}", plain_cap) for i in range(4)]
    prof = {r["host"]: r for r in host_profile(_pages(spark, rows)).collect()}
    assert prof["spa.test"]["is_spa"] and prof["spa.test"]["use_js"]
    assert prof["spa.test"]["confidence"] >= 0.5
    assert not prof["plain.test"]["is_spa"]
    assert prof["plain.test"]["confidence"] < 0.3


def test_crawl_stats(spark):
    rows = [("a", 0, 0, 200, True), ("b", 1, 1, 404, False), ("c", 2, 2, 200, True)]
    df = spark.createDataFrame(rows, "url string, depth int, `order` long, status int, ok boolean")
    s = crawl_stats(df).collect()[0]
    assert (s["total_urls"], s["crawled_urls"], s["failed_urls"], s["max_depth_reached"]) \
        == (3, 2, 1, 2)


def test_lenient_validation(spark):
    cases = [("example.com", True, "https://example.com"),
             ("https://ok.test/x", True, "https://ok.test/x"),
             ("HTTP://ok.test", True, "HTTP://ok.test"),
             ("", False, "https://")]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    out = df.select("url", lenient_valid_expr(F.col("url")).alias("v"),
                    lenient_fix_expr(F.col("url")).alias("f")).collect()
    for row, (raw, valid, fixed) in zip(out, cases):
        assert bool(row["v"]) == valid, raw
        assert row["f"] == fixed, raw
