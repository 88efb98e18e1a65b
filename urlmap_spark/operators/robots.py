"""robots.txt as DataFrames: parse raw lines, gate the frontier.

Parsing mirrors the reference's scanner loop (reference:
internal/robots/robots.go:138-178): trim, drop comments/blank lines,
split on the first ':', track the current User-agent group, keep
Allow/Disallow/Crawl-delay rules whose UA group matches ours.
The group-tracking (order-dependent in Go) becomes a last-non-null
window over line numbers — fully distributed.

Gating mirrors IsAllowed (robots.go:49-78 + checkRules :208-225 +
pathMatches :228-252): broadcast-join frontier->rules on host, prefix
match (with trailing-* wildcard), LONGEST matching rule path wins —
with the FIRST rule in file order winning a length tie (checkRules
uses a strict `>` while scanning in file order, robots.go:214-221) —
default allow, fail-open for hosts with no rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    raw_lines: DataFrame, user_agent: str = "urlmap/1.0"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """raw_lines(host, lineno, line) -> (rules, delays, sitemaps).

    rules(host, user_agent, directive['Allow'|'Disallow'], path, lineno)
    delays(host, crawl_delay_s double) — the LAST matching Crawl-delay
    line wins, as the reference assigns robotsData.crawlDelay per line
    (robots.go:169-174); unparseable values are skipped like a failed
    time.ParseDuration.
    sitemaps(host, sitemap, lineno) — collected regardless of the
    current UA group (robots.go:175-177).
    """
    t = raw_lines.withColumn("line", F.trim("line"))
    t = t.filter((F.col("line") != "") & ~F.col("line").startswith("#"))
    t = t.filter(F.col("line").contains(":"))
    t = t.withColumn("directive", F.trim(F.lower(F.substring_index("line", ":", 1))))
    t = t.withColumn(
        "value",
        F.trim(F.expr("substring(line, instr(line, ':') + 1, 1 << 30)")),
    )
    # sitemaps are group-independent (robots.go:175-177) — grab them
    # before the UA-group bookkeeping
    sitemaps = (
        t.filter(F.col("directive") == "sitemap")
        .select("host", F.col("value").alias("sitemap"), "lineno")
    )
    # current user-agent group = last UA line at or before this line
    w = Window.partitionBy("host").orderBy("lineno").rowsBetween(Window.unboundedPreceding, 0)
    t = t.withColumn(
        "ua_group",
        F.last(F.when(F.col("directive") == "user-agent", F.col("value")), ignorenulls=True).over(w),
    ).filter(F.col("ua_group").isNotNull())
    # UA match: '*' or our UA contains the pattern (case-insensitive);
    # an EMPTY pattern never matches (reference: robots.go:189-196 —
    # matchesUserAgent returns false for "" and rules are only kept when
    # currentUserAgent != "")
    ua_ok = (F.col("ua_group") != "") & (
        (F.col("ua_group") == "*")
        | F.lit(user_agent.lower()).contains(F.lower(F.col("ua_group")))
    )
    rules = (
        t.filter(F.col("directive").isin("allow", "disallow") & ua_ok)
        .select(
            "host",
            F.col("ua_group").alias("user_agent"),
            F.initcap("directive").alias("directive"),
            F.col("value").alias("path"),
            "lineno",
        )
    )
    delays = (
        t.filter((F.col("directive") == "crawl-delay") & ua_ok)
        .withColumn("_d", F.col("value").try_cast("double"))
        .filter(F.col("_d").isNotNull())
        .groupBy("host")
        .agg(F.max_by("_d", "lineno").alias("crawl_delay_s"))
    )
    return rules, delays, sitemaps


def path_matches_expr(pattern, url_path):
    """pathMatches (reference: robots.go:228-252): empty pattern never
    matches; trailing '*' = prefix on the stem; otherwise prefix match."""
    wildcard = pattern.endswith("*")
    stem = F.when(wildcard, F.substring(pattern, F.lit(1), F.length(pattern) - 1)).otherwise(pattern)
    return (pattern != "") & url_path.startswith(stem)


def robots_gate(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Adds ``robots_allowed`` to the frontier (host/path derived from url).

    Longest-matching-rule-wins via max_by(directive, (length(path),
    -lineno)) — a hash aggregate with map-side partial, cheaper than a
    row_number window. On a length tie the FIRST rule in file order wins
    (reference checkRules keeps a rule only when strictly longer,
    robots.go:214-221). Rules constructed without a ``lineno`` column
    (ad-hoc rule tables) tie-break as all-equal, i.e. undefined order,
    same as a reference file would never produce.
    Hosts with no matching rule (or no rules at all) default to allowed
    (fail-open, reference: robots.go:69-72).
    """
    f = frontier.withColumn("_host", F.expr("try_parse_url(url, 'HOST')")) \
                .withColumn("_path", F.coalesce(F.expr("try_parse_url(url, 'PATH')"), F.lit("/")))
    lineno = F.col("lineno") if "lineno" in rules.columns else F.lit(0)
    r = rules.select(F.col("host").alias("_host"), "directive",
                     F.col("path").alias("pattern"), lineno.alias("_lineno"))
    joined = f.join(F.broadcast(r), "_host", "left")
    matched = joined.withColumn(
        "_match",
        F.when(
            F.col("pattern").isNotNull() & path_matches_expr(F.col("pattern"), F.col("_path")),
            F.struct(F.length("pattern").alias("l"),
                     (-F.col("_lineno")).alias("nl"),
                     (F.col("directive") == "Allow").alias("a")),
        ),
    )
    keys = [c for c in frontier.columns]
    best = (
        matched.groupBy(*keys)
        .agg(F.max("_match").alias("_best"))
        .withColumn("robots_allowed", F.coalesce(F.col("_best.a"), F.lit(True)))
        .drop("_best")
    )
    return best
