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
    errors surface as invalid_after_resolution).

    Kept-ness is derived INLINE from the canonicalization category —
    native categories (1/2/6) survive unless an absolute href has an
    empty host, and only category-9 hrefs consult the exact UDF — so the
    whole operator is one scan + one hash aggregate, no self-join.
    Pages with zero hrefs contribute nothing (the reference only counts
    real hrefs, parser.go:248-333): the posexplode_outer null row is
    filtered on ``pos``."""
    from ..functions.urlkernel import canonical_outlink_udf

    exploded = (
        explode_hrefs(pages, caption_col)
        .filter(F.col("pos").isNotNull())
        .withColumn("_cat", href_category_expr())
    )
    # mirror of canonicalize_links' native-branch guard: an absolute href
    # whose scheme://host piece collapses to just the scheme is dropped
    sh = F.substring_index(
        F.substring_index(F.substring_index(F.col("href"), "#", 1), "?", 1), "/", 3)
    tagged = exploded.withColumn(
        "_kept",
        F.when(F.col("_cat") == 1, ~sh.isin("http://", "https://"))
        .when(F.col("_cat").isin(2, 3, 4, 6), F.lit(True))
        .otherwise(canonical_outlink_udf(F.col("url"), F.col("href")).isNotNull()),
    ).withColumn(
        "outcome",
        F.when(F.trim(F.coalesce(F.col("href"), F.lit(""))) == "", F.lit("empty_href"))
        .when(F.lower(F.trim("href")).rlike(
            r"^(javascript:|mailto:|tel:|ftp:|file:|data:|#)"), F.lit("filtered_out"))
        .when(F.col("_kept") & F.col("href").rlike("^https?://"), F.lit("valid"))
        .when(F.col("_kept"), F.lit("relative_resolved"))
        .otherwise(F.lit("invalid_after_resolution")),
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


def dynamic_verify(pages: DataFrame, caption_col: str = "caption",
                   rendered_col: str = "rendered_caption") -> DataFrame:
    """Dynamic SPA verification (reference: spa_detector.go:229-275
    VerifyWithJS): compare the link count of the static content against
    the JS-rendered content. Per page:
      static == 0 -> is_spa = (js > 0), confidence = min(js, 1)
      else ratio = (js - static) / static; is_spa = ratio > 0.5,
           confidence = min(ratio, 1)
    A missing rendered column value falls back to the static content
    (= the reference's render failure -> HTTP fallback), yielding
    ratio 0 / not-SPA. Pure native expressions, one scan."""
    from .extract import hrefs_expr

    n_s = F.size(hrefs_expr(F.coalesce(F.col(caption_col), F.lit(""))))
    n_j = F.size(hrefs_expr(F.coalesce(F.col(rendered_col), F.col(caption_col), F.lit(""))))
    base = pages.select(
        "url",
        F.expr("try_parse_url(url, 'HOST')").alias("host"),
        n_s.alias("n_static"),
        n_j.alias("n_js"),
    )
    ns, nj = F.col("n_static"), F.col("n_js")
    ratio = (nj - ns).cast("double") / ns
    return base.select(
        "*",
        F.when(ns == 0, nj > 0).otherwise(ratio > 0.5).alias("is_spa"),
        F.round(
            F.when(ns == 0, F.least(nj.cast("double"), F.lit(1.0)))
            .otherwise(F.least(ratio, F.lit(1.0))), 6).alias("confidence"),
    )


def render_modes(pages: DataFrame, caption_col: str = "caption",
                 rendered_col: str | None = "rendered_caption",
                 threshold: float = 0.5, low_link_count: int = 10) -> DataFrame:
    """The detection-cache table (host, use_js) that drives fetch
    dispatch (#26/#27). Static scoring (host_profile) decides by
    default; where a rendered column exists, dynamic verification
    (majority of the host's pages confirmed SPA) OVERRIDES the static
    guess — mirroring the reference's detector cache being refreshed by
    VerifyWithJS results (spa_detector.go:96-136, 229-275)."""
    prof = host_profile(pages, caption_col, threshold, low_link_count) \
        .select("host", F.col("use_js").alias("_static"))
    if rendered_col is None or rendered_col not in pages.columns:
        return prof.select("host", F.col("_static").alias("use_js"))
    dyn = (
        dynamic_verify(pages, caption_col, rendered_col)
        .groupBy("host")
        .agg((F.avg(F.col("is_spa").cast("double")) > 0.5).alias("_dyn"))
    )
    return prof.join(dyn, "host", "left").select(
        "host", F.coalesce("_dyn", "_static").alias("use_js"))


def dispatch_content(fetched: DataFrame, modes: DataFrame,
                     caption_col: str = "caption",
                     rendered_col: str = "rendered_caption") -> DataFrame:
    """Unified fetch dispatch (reference: unified_client.go:77-119):
    pick the JS-rendered content for hosts whose detection-cache row
    says use_js, falling back to the static content when rendering
    produced nothing (GetWithFallback). ``modes`` (host, use_js) is
    broadcast — it is a per-host dimension table, tiny by construction.

    Returns ``fetched`` with ``caption`` replaced by the effective
    content plus a ``render_mode`` boolean; the rendered column is
    consumed (dropped)."""
    m = F.broadcast(modes.select(F.col("host").alias("_rm_host"),
                                 F.col("use_js").alias("_use_js")))
    out = (
        fetched.withColumn("_rm_host", F.expr("try_parse_url(url, 'HOST')"))
        .join(m, "_rm_host", "left")
        .withColumn(
            "render_mode",
            F.coalesce(F.col("_use_js"), F.lit(False))
            & F.col(rendered_col).isNotNull(),
        )
        .withColumn(
            caption_col,
            F.when(F.col("render_mode"), F.col(rendered_col)).otherwise(F.col(caption_col)),
        )
        .drop("_rm_host", "_use_js", rendered_col)
    )
    return out


def crawl_stats(results: DataFrame) -> DataFrame:
    """Run-level aggregate matching the reference's CrawlStats counters
    (reference: internal/crawler/crawler.go:36-44)."""
    return results.agg(
        F.count("*").alias("total_urls"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("crawled_urls"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failed_urls"),
        F.max("depth").alias("max_depth_reached"),
    )
