"""Extraction statistics and SPA host profiling.

ExtractionStats (reference: internal/parser/parser.go:248-333): classify
every raw href into the reference's outcome classes and aggregate counts
— a tagged column + one hash aggregate (map-side partial).

SPA detection (reference: internal/detector/spa_detector.go:39-226):
the reference scores each page's HTML for framework markers, SPA DOM
shape, low link count and dynamic-content hints, with a per-domain TTL
cache. Batch-side this is a per-host aggregation over signal columns —
computed once per run into a ``host_profile`` dimension table that the
fetch path broadcast-joins to pick the render mode (#27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import explode_hrefs, href_category_expr

OUTCOME_CLASSES = [
    "empty_href", "filtered_out", "valid", "relative_resolved",
    "invalid_after_resolution",
]


def extraction_stats(pages: DataFrame, caption_col: str = "caption") -> DataFrame:
    """Counts per outcome class over all hrefs (reference's 8 counters
    collapse to the classes that exist in a batch pipeline; resolution
    errors surface as invalid_after_resolution)."""
    from .extract import canonicalize_links

    exploded = explode_hrefs(pages, caption_col).withColumn("_cat", href_category_expr())
    links = canonicalize_links(exploded).select("url", "pos", F.lit(True).alias("_kept"))
    tagged = (
        exploded.alias("e")
        .join(links.alias("l"),
              (F.col("e.url") == F.col("l.url")) & (F.col("e.pos") == F.col("l.pos")),
              "left")
        .withColumn(
            "outcome",
            F.when(F.trim(F.coalesce(F.col("href"), F.lit(""))) == "", F.lit("empty_href"))
            .when(F.lower(F.trim("href")).rlike(
                r"^(javascript:|mailto:|tel:|ftp:|file:|data:|#)"), F.lit("filtered_out"))
            .when(F.col("_kept").isNotNull() & F.col("href").rlike("^https?://"),
                  F.lit("valid"))
            .when(F.col("_kept").isNotNull(), F.lit("relative_resolved"))
            .otherwise(F.lit("invalid_after_resolution")),
        )
    )
    return tagged.groupBy("outcome").agg(F.count("*").alias("n"))


# --- SPA host profile --------------------------------------------------------

FRAMEWORK_MARKERS = ["react", "vue", "angular", "svelte", "next", "nuxt"]
DYNAMIC_MARKERS = ["loading", "spinner", "skeleton", "placeholder"]


def host_profile(pages: DataFrame, caption_col: str = "caption",
                 threshold: float = 0.5, low_link_count: int = 10) -> DataFrame:
    """Per-host SPA confidence (reference weights, spa_detector.go:55-81):
    framework markers +0.4, SPA structure +0.3, <10 links +0.2,
    dynamic-content hints +0.1; IsSPA at confidence >= threshold or
    (structure and >= 0.3). Returns (host, confidence, is_spa, use_js)."""
    cap = F.lower(F.col(caption_col))
    fw = F.greatest(*[cap.contains(m).cast("int") for m in FRAMEWORK_MARKERS])
    dyn = F.greatest(*[cap.contains(m).cast("int") for m in DYNAMIC_MARKERS])
    structure = (cap.contains("id=\"root\"") | cap.contains("id=\"app\"")).cast("int")
    n_links = F.size(F.regexp_extract_all(F.col(caption_col), F.lit(r'href="([^"]*)"'), F.lit(1)))
    per_page = pages.select(
        F.expr("try_parse_url(url, 'HOST')").alias("host"),
        fw.alias("fw"), dyn.alias("dyn"), structure.alias("structure"),
        (n_links < low_link_count).cast("int").alias("low_links"),
    )
    prof = per_page.groupBy("host").agg(
        F.round(
            0.4 * F.avg("fw") + 0.3 * F.avg("structure")
            + 0.2 * F.avg("low_links") + 0.1 * F.avg("dyn"), 6).alias("confidence"),
        F.avg("structure").alias("_st"),
        F.count("*").alias("n_pages"),
    )
    is_spa = (F.col("confidence") >= threshold) | (
        (F.col("_st") > 0) & (F.col("confidence") >= 0.3))
    return prof.withColumn("is_spa", is_spa).withColumn("use_js", is_spa).drop("_st")


def crawl_stats(results: DataFrame) -> DataFrame:
    """Run-level aggregate matching the reference's CrawlStats counters
    (reference: internal/crawler/crawler.go:36-44)."""
    return results.agg(
        F.count("*").alias("total_urls"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("crawled_urls"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failed_urls"),
        F.max("depth").alias("max_depth_reached"),
    )
