"""Outlink extraction: caption -> ordered hrefs -> canonical URLs.

The reference extracts ``a[href]`` in document order with goquery
(reference: internal/parser/parser.go:120-208). Our pages are
image+caption rows whose caption embeds ``href="..."`` tokens; the
extraction is a single Arrow-vectorized regex findall (pandas .str
accessor — no per-row Python loop), followed by posexplode and the
one-pass canonicalization UDF.

Document order is preserved as the ``pos`` column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import urlcore
from ..functions.urlkernel import canonical_outlink_udf

HREF_RE = r'href="([^"]*)"'


@pandas_udf(T.ArrayType(T.StringType()))
def hrefs_udf(caption: pd.Series) -> pd.Series:
    """Ordered raw hrefs from caption, vectorized (pandas str.findall)."""
    return caption.fillna("").str.findall(HREF_RE)


def hrefs_expr(caption: Column) -> Column:
    """Native twin of hrefs_udf: regexp_extract_all stays JVM-side (the
    hot path — no Python at all for the findall step)."""
    return F.regexp_extract_all(caption, F.lit(HREF_RE), F.lit(1))


def hrefs_py(caption: str) -> list[str]:
    """Pure-Python twin for the oracle BFS."""
    import re

    return re.findall(HREF_RE, caption or "")


def extract_outlinks(pages: DataFrame, base_col: str = "url",
                     caption_col: str = "caption", use_udf_findall: bool = False,
                     native_fast_path: bool = True) -> DataFrame:
    """pages -> one row per (page, pos, canonical outlink).

    Pipeline (reference: internal/parser/parser.go:155-199):
      posexplode(hrefs) -> canonicalize -> drop nulls.
    Dropped hrefs (empty / skip-scheme / invalid after resolution) simply
    vanish, exactly like the reference's continue branches. Duplicates and
    document order are preserved (``pos``).

    Hybrid execution: hrefs that are ALREADY absolute lowercase http(s)
    URLs need no RFC-3986 resolution — they take a pure native-expression
    path (validity + normalization, whole-stage codegen, zero Python);
    only relative/odd hrefs cross into the Arrow UDF. The two paths are
    a union — row order is irrelevant because document order travels in
    ``pos``. Parity of the native normalizer with the exact UDF is pinned
    by tests/test_urlkernel.py and the crawl-vs-oracle suite.
    """
    from ..functions.urlkernel import is_valid_expr, normalize_simple_expr

    findall = hrefs_udf(F.col(caption_col)) if use_udf_findall else hrefs_expr(F.col(caption_col))
    exploded = pages.select(
        "*", F.posexplode_outer(findall).alias("pos", "href")
    )
    if not native_fast_path:
        return (
            exploded
            .withColumn("outlink", canonical_outlink_udf(F.col(base_col), F.col("href")))
            .filter(F.col("outlink").isNotNull())
        )
    # Absolute lowercase http(s) hrefs: the reference passes them through
    # resolution untouched (parser.go:171-173), so canonicalization is
    # validate + normalize — both native. (Uppercase schemes go to the
    # UDF: Go's URL re-serialization lowercases the scheme.)
    href = F.col("href")
    is_simple_abs = href.startswith("http://") | href.startswith("https://")
    # Root-relative hrefs with no dot-segments resolve natively too:
    # urljoin(base, "/p?q#f") == scheme://host(base) + "/p?q#f". Excluded
    # (-> UDF): protocol-relative "//host/x", any "./"/"../" segment, a
    # trailing "/." or "/..", and hrefs needing trimming.
    is_simple_rootrel = (
        href.startswith("/") & ~href.startswith("//")
        & ~href.contains("./") & ~href.endswith("/.") & ~href.endswith("/..")
        & (href == F.trim(href))
    )
    # scheme://host of the (already canonical, absolute) base page url =
    # everything before the 3rd '/'
    scheme_host = F.substring_index(F.col(base_col), "/", 3)
    fast_abs = (
        exploded.filter(is_simple_abs)
        .filter(F.coalesce(is_valid_expr(href), F.lit(False)))
        .withColumn("outlink", normalize_simple_expr(href))
    )
    fast_rel = (
        exploded.filter(~is_simple_abs & is_simple_rootrel)
        .withColumn("outlink", normalize_simple_expr(F.concat(scheme_host, href)))
    )
    slow = (
        exploded.filter(~is_simple_abs & ~is_simple_rootrel)
        .withColumn("outlink", canonical_outlink_udf(F.col(base_col), href))
        .filter(F.col("outlink").isNotNull())
    )
    return fast_abs.unionByName(fast_rel).unionByName(slow)


def extract_outlinks_py(base_url: str, caption: str) -> list[str]:
    """Pure-Python twin of extract_outlinks for the oracle BFS: returns
    canonical outlinks in document order, duplicates preserved."""
    out = []
    for href in hrefs_py(caption):
        c = urlcore.canonical_outlink(base_url, href)
        if c is not None:
            out.append(c)
    return out
