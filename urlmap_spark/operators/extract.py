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
                     caption_col: str = "caption", use_udf_findall: bool = False) -> DataFrame:
    """pages -> one row per (page, pos, canonical outlink).

    Pipeline (reference: internal/parser/parser.go:155-199):
      posexplode(hrefs) -> canonical_outlink_udf(base, href) -> drop nulls.
    Dropped hrefs (empty / skip-scheme / invalid after resolution) simply
    vanish, exactly like the reference's continue branches. Duplicates and
    document order are preserved.
    """
    findall = hrefs_udf(F.col(caption_col)) if use_udf_findall else hrefs_expr(F.col(caption_col))
    exploded = pages.select(
        "*", F.posexplode_outer(findall).alias("pos", "href")
    )
    return (
        exploded
        .withColumn("outlink", canonical_outlink_udf(F.col(base_col), F.col("href")))
        .filter(F.col("outlink").isNotNull())
    )


def extract_outlinks_py(base_url: str, caption: str) -> list[str]:
    """Pure-Python twin of extract_outlinks for the oracle BFS: returns
    canonical outlinks in document order, duplicates preserved."""
    out = []
    for href in hrefs_py(caption):
        c = urlcore.canonical_outlink(base_url, href)
        if c is not None:
            out.append(c)
    return out
