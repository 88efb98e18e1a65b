"""Spark URL kernel: Arrow-vectorized pandas UDFs + native-expression twins.

Two implementations of every predicate/projection, by design:

- **Native expressions** (``*_expr``): pure ``pyspark.sql.functions``
  column expressions — JVM-side, whole-stage-codegen'd, zero Python.
  These are the HOT PATH used inside the crawl plan for filters whose
  semantics are exactly expressible (skip-scheme, validity, same-domain,
  path-prefix, status window, depth gate).
- **pandas UDFs** (``*_udf``): Arrow-batched, exact re-implementations
  backed by :mod:`urlmap_spark.functions.urlcore` — used where RFC-3986
  resolution / Go-parity parsing genuinely needs Python (relative-URL
  resolution, normalization of arbitrary hrefs). No per-row Python UDFs
  anywhere: batches cross the JVM/Python boundary once per Arrow batch.

Parity between the two is pinned by tests/test_urlkernel.py against the
reference's test goldens (reference: internal/url/url_test.go:7-306).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import urlcore

# ---------------------------------------------------------------------------
# Native-expression twins (JVM hot path, reference: internal/url/url.go)
# ---------------------------------------------------------------------------

_SKIP_RE = r"^(?i)(javascript:|mailto:|tel:|ftp:|file:|data:|#)"


def should_skip_expr(href: Column) -> Column:
    """Skip-scheme predicate (reference: internal/url/url.go:176-201)."""
    t = F.trim(href)
    return (t == "") | t.rlike(_SKIP_RE)


def is_valid_expr(url: Column) -> Column:
    """http/https + non-empty host (reference: internal/url/url.go:17-39).

    ``try_parse_url(_, 'HOST')`` returns NULL for empty hosts, matching the
    reference's Host=="" rejection.
    """
    t = F.trim(url)
    scheme_ok = F.lower(t).rlike(r"^(http|https)://")
    host = F.try_parse_url(t, F.lit("HOST"))
    return scheme_ok & host.isNotNull() & (host != "")


def host_expr(url: Column) -> Column:
    """Hostname without port (reference: internal/url/url.go:42-63).
    parse_url HOST keeps the port, so strip a trailing :digits."""
    h = F.try_parse_url(F.trim(url), F.lit("HOST"))
    return F.regexp_replace(h, r":\d+$", "")


def same_domain_expr(url1: Column, url2: Column) -> Column:
    """Case-insensitive host equality (reference: internal/url/url.go:121-133)."""
    return F.lower(host_expr(url1)) == F.lower(host_expr(url2))


def _dir_path_expr(path: Column) -> Column:
    p = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    return F.when((p != "/") & ~p.endswith("/"), F.concat(p, F.lit("/"))).otherwise(p)


def path_expr(url: Column) -> Column:
    return F.try_parse_url(F.trim(url), F.lit("PATH"))


def same_path_prefix_expr(base_url: Column, target_url: Column) -> Column:
    """Directory-style prefix scope filter (reference: internal/url/url.go:138-173)."""
    bp = _dir_path_expr(path_expr(base_url))
    tp = _dir_path_expr(path_expr(target_url))
    return same_domain_expr(base_url, target_url) & tp.startswith(bp)


def status_ok_expr(status: Column) -> Column:
    """Success window 200 <= s < 400 (reference: internal/crawler/crawler.go:331-334)."""
    return status.between(200, 399)


def depth_ok_expr(depth: Column, max_depth: int) -> Column:
    """-1 = unlimited (reference: internal/crawler/crawler.go:207-211)."""
    return (F.lit(max_depth) < 0) | (depth <= F.lit(max_depth))


def normalize_simple_expr(url: Column) -> Column:
    """Native normalization for ALREADY-ABSOLUTE http(s) URLs without
    percent-escapes (our generated URL universe): strip fragment, strip one
    trailing slash on a non-root path, force empty path to "/".
    Exact-parity twin of urlcore.normalize_url on this universe (pinned by
    tests); the pandas UDF remains the general implementation."""
    t = F.trim(url)
    nofrag = F.regexp_replace(t, r"#.*$", "")
    # scheme://host  +  path  +  ?query
    scheme_host = F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    rest = F.substring(nofrag, F.length(scheme_host) + 1, F.lit(1 << 30))
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.substring(rest, F.length(path) + 1, F.lit(1 << 30))  # includes leading ? or empty
    # a BARE '?' (empty query) is dropped by the kernel's rebuild
    # (urlsplit cannot distinguish it); found by the hypothesis fuzz
    query = F.when(query == "?", F.lit("")).otherwise(query)
    path1 = _strip_one_trailing_slash(path)
    path2 = F.when(path1 == "", F.lit("/")).otherwise(path1)
    return F.concat(scheme_host, path2, query)


def _strip_one_trailing_slash(path: Column) -> Column:
    return F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - F.lit(1)),
    ).otherwise(path)


# ---------------------------------------------------------------------------
# Arrow-batched pandas UDFs (exact path; reference parity via urlcore)
# ---------------------------------------------------------------------------


@pandas_udf(T.BooleanType())
def is_valid_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda s: urlcore.is_valid_url(s) if s is not None else False)


@pandas_udf(T.StringType())
def extract_domain_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda s: urlcore.extract_domain(s) if s is not None else None)


@pandas_udf(T.StringType())
def normalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda s: urlcore.normalize_url(s) if s is not None else None)


@pandas_udf(T.StringType())
def resolve_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    out = [
        urlcore.resolve_url(b, h) if b is not None and h is not None else None
        for b, h in zip(base, href)
    ]
    return pd.Series(out, dtype=object)


@pandas_udf(T.BooleanType())
def should_skip_udf(href: pd.Series) -> pd.Series:
    return href.map(lambda s: urlcore.should_skip_url(s) if s is not None else True)


@pandas_udf(T.StringType())
def _canonical_outlink_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """One-pass skip->resolve->validate->normalize: a single Arrow
    round-trip per link batch (reference pipeline:
    internal/parser/parser.go:155-199)."""
    out = [
        urlcore.canonical_outlink(b, h) if b is not None and h is not None else None
        for b, h in zip(base, href)
    ]
    return pd.Series(out, dtype=object)


# Marked non-deterministic ON PURPOSE (it is pure): this stops Catalyst
# from substituting the UDF into a pushed-down filter, which would add a
# second ArrowEvalPython node and evaluate the UDF TWICE per row — a 2x
# slowdown of the crawl's hottest stage, observed via explain("formatted").
canonical_outlink_udf = _canonical_outlink_udf.asNondeterministic()


def lenient_valid_expr(url: Column) -> Column:
    """pkg-level lenient validation (reference: pkg/utils/url.go:10-30):
    auto-prefix https:// when the scheme is missing, then require a host.
    NOTE the reference's pkg variant keeps the port in ExtractDomain
    (pkg/utils/url.go:39) unlike the internal kernel."""
    fixed = F.when(~F.trim(url).rlike(r"^(?i)https?://"),
                   F.concat(F.lit("https://"), F.trim(url))).otherwise(F.trim(url))
    return is_valid_expr(fixed)


def lenient_fix_expr(url: Column) -> Column:
    """The https://-prefixed form used by lenient validation."""
    t = F.trim(url)
    return F.when(~t.rlike(r"^(?i)https?://"), F.concat(F.lit("https://"), t)).otherwise(t)
