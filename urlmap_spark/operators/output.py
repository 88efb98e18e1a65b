"""Output post-processing: dedup, sort, and the four output formats.

Mirrors the reference's output stage (reference: internal/output/
output.go:44-211): URLs from ALL results (crawled and failed,
main.go:227-230), first-occurrence dedup, lexicographic sort, then
text / json / csv / xml rendering. The global sort is a range-
partitioned Spark sort — no single-node funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RFC3339 = "yyyy-MM-dd'T'HH:mm:ssXXX"


def unique_sorted_urls(results: DataFrame, url_col: str = "url") -> DataFrame:
    """dedup -> lexicographic sort (reference: output.go:44-57, :105-109).
    The reference's order-preserving dedup (output.go:60-78) is followed
    by a sort, so dropDuplicates is semantically identical here."""
    return results.select(url_col).dropDuplicates([url_col]).orderBy(url_col)


def dedup_preserving_order(results: DataFrame, url_col: str = "url",
                           order_col: str = "order") -> DataFrame:
    """First-occurrence-order dedup (reference: output.go:60-78)."""
    w = Window.partitionBy(url_col).orderBy(order_col)
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )


def successful_urls(results: DataFrame) -> DataFrame:
    """URLs whose fetch succeeded (reference: crawler.go:425-433)."""
    return results.filter(F.col("ok")).select("url")


def all_urls(results: DataFrame) -> DataFrame:
    """Crawled AND failed URLs (reference: crawler.go:416-422)."""
    return results.select("url")


def format_text(urls: DataFrame) -> DataFrame:
    return urls.select(F.col("url").alias("value"))


def format_json(urls: DataFrame, ts_col=None) -> DataFrame:
    """One output row: the reference's JSON envelope
    {urls:[{url,timestamp,depth?}], timestamp, total} (output.go:132-155)."""
    ts = ts_col if ts_col is not None else F.current_timestamp()
    rows = urls.select(F.struct(
        F.col("url"), F.date_format(ts, RFC3339).alias("timestamp")
    ).alias("u"), F.col("url").alias("_k"))
    return rows.agg(
        F.to_json(F.struct(
            F.sort_array(F.collect_list("u")).alias("urls"),
            F.date_format(F.current_timestamp(), RFC3339).alias("timestamp"),
            F.count("*").alias("total"),
        )).alias("value")
    )


def format_csv(urls: DataFrame, ts_col=None) -> DataFrame:
    """url,timestamp rows; header handled by the csv writer
    (reference: output.go:158-180)."""
    ts = ts_col if ts_col is not None else F.current_timestamp()
    return urls.select("url", F.date_format(ts, RFC3339).alias("timestamp"))


def format_xml(urls: DataFrame, ts_col=None) -> DataFrame:
    """XML envelope rendered with native string expressions
    (reference: output.go:183-211). One row per URL plus header/footer
    assembled at write time by xml_document()."""
    return urls.select(
        F.format_string('  <url><loc>%s</loc></url>',
                        F.regexp_replace(F.regexp_replace("url", "&", "&amp;"), "<", "&lt;"))
        .alias("value")
    )


def xml_document(urls: DataFrame, max_rows: int = 100_000) -> str:
    """Small-result convenience: full XML document as one string.
    Driver-side BY DEFINITION (the return type is a str), so it is
    bounded: streams at most ``max_rows`` URL rows through
    toLocalIterator and raises past the cap instead of silently
    collecting an unbounded document — the scale paths are
    write_output(..., 'xml') (single-task file write) and xml_lines()
    (ordered line frame, never driver-side)."""
    out: list[str] = []
    # head(2 lines) + up to max_rows body rows + foot(1 line)
    for i, r in enumerate(xml_lines(urls).toLocalIterator()):
        if i >= max_rows + 3:
            raise ValueError(
                f"xml_document: result exceeds max_rows={max_rows}; use "
                "write_output(urls, path, 'xml') or xml_lines(urls) for "
                "large results")
        out.append(r["value"])
    return "\n".join(out)


def _enveloped_lines(urls: DataFrame, head: list[str], body: DataFrame,
                     foot: list[str]) -> DataFrame:
    """head lines + body rows (sorted by _k) + foot lines, as one
    ordered single-column frame. orderBy range-partitions; the final
    coalesce(1) at write time concatenates partitions in index order, so
    ONE task streams the document to disk — rows never visit the driver."""
    spark = urls.sparkSession
    h = spark.createDataFrame([(0, f"{i:08d}", s) for i, s in enumerate(head)],
                              "_s int, _k string, value string")
    f_ = spark.createDataFrame([(2, f"{i:08d}", s) for i, s in enumerate(foot)],
                               "_s int, _k string, value string")
    return (
        h.unionByName(body.select(F.lit(1).alias("_s"), F.col("_k"), "value"))
        .unionByName(f_)
        .orderBy("_s", "_k")
        .select("value")
    )


def xml_lines(urls: DataFrame) -> DataFrame:
    """The reference XML envelope (output.go:183-211) as an ordered
    single-column line frame — built WITHOUT a driver collect; consumers
    either single-task-write it (write_xml) or stream it row-by-row
    through toLocalIterator (CLI stdout)."""
    body = urls.select(
        F.col("url").alias("_k"),
        F.format_string('  <url><loc>%s</loc></url>',
                        F.regexp_replace(F.regexp_replace("url", "&", "&amp;"), "<", "&lt;"))
        .alias("value"),
    )
    return _enveloped_lines(
        urls, ['<?xml version="1.0" encoding="UTF-8"?>', "<crawloutput>"],
        body, ["</crawloutput>"])


def write_xml(urls: DataFrame, path: str) -> None:
    xml_lines(urls).coalesce(1).write.mode("overwrite").text(path)


def json_lines(urls: DataFrame, ts_col=None) -> DataFrame:
    """The reference JSON envelope {urls:[...], timestamp, total}
    (output.go:132-155) as an ordered line frame: one object row per URL
    (leading comma except the first), envelope head/foot rows around
    them. Driver traffic is ONE scalar aggregate (min url + count), not
    the row set."""
    ts = ts_col if ts_col is not None else F.current_timestamp()
    # dedup first (reference: output.go removeDuplicates runs before every
    # writer) — without it, a repeated min-URL row would emit multiple
    # comma-less body lines and the document would not parse
    urls = urls.dropDuplicates(["url"])
    first_url, total = urls.agg(F.min("url"), F.count("*")).first()
    body = urls.select(
        F.col("url").alias("_k"),
        F.concat(
            F.when(F.col("url") == F.lit(first_url), F.lit("  ")).otherwise(F.lit("  ,")),
            F.to_json(F.struct(F.col("url"), F.date_format(ts, RFC3339).alias("timestamp"))),
        ).alias("value"),
    )
    import datetime

    now = datetime.datetime.now(datetime.timezone.utc).astimezone()
    z = now.strftime("%z")
    stamp = now.strftime("%Y-%m-%dT%H:%M:%S") + f"{z[:3]}:{z[3:]}"  # RFC3339 offset
    foot = ['], "timestamp": %s, "total": %d}' % (json_quote(stamp), total)]
    return _enveloped_lines(urls, ['{"urls": ['], body, foot)


def write_json(urls: DataFrame, path: str, ts_col=None) -> None:
    json_lines(urls, ts_col).coalesce(1).write.mode("overwrite").text(path)


def json_quote(s: str) -> str:
    import json as _json

    return _json.dumps(s)


def write_output(urls: DataFrame, path: str, fmt: str = "text") -> None:
    if fmt == "text":
        format_text(urls).coalesce(1).write.mode("overwrite").text(path)
    elif fmt == "json":
        write_json(urls, path)
    elif fmt == "csv":
        format_csv(urls).coalesce(1).write.mode("overwrite").csv(path, header=True)
    elif fmt == "xml":
        write_xml(urls, path)
    else:
        raise ValueError(f"unsupported output format: {fmt}")  # output.go:112-129
