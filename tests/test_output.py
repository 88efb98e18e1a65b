"""Output post-processing goldens (reference: internal/output/
output_test.go:10-62 dedup, :201-299 formats)."""

import json

from urlmap_spark.operators import output as O


def _results(spark):
    rows = [
        ("https://h.test/b", 1, 1, 200, True),
        ("https://h.test/a", 1, 2, 200, True),
        ("https://h.test/b", 2, 3, 200, True),   # duplicate URL
        ("https://h.test/c", 2, 4, 404, False),  # failed rows kept in output
    ]
    return spark.createDataFrame(
        rows, "url string, depth int, `order` long, status int, ok boolean")


def test_unique_sorted(spark):
    urls = [r["url"] for r in O.unique_sorted_urls(_results(spark)).collect()]
    assert urls == ["https://h.test/a", "https://h.test/b", "https://h.test/c"]


def test_dedup_preserving_order(spark):
    rows = O.dedup_preserving_order(_results(spark)).orderBy("order").collect()
    assert [r["url"] for r in rows] == [
        "https://h.test/b", "https://h.test/a", "https://h.test/c"]


def test_success_only_and_all(spark):
    df = _results(spark)
    assert O.successful_urls(df).count() == 3
    assert O.all_urls(df).count() == 4  # failed URLs included (main.go:227-230)


def test_formats(spark, tmp_path):
    urls = O.unique_sorted_urls(_results(spark))
    O.write_output(urls, str(tmp_path / "t"), "text")
    import glob

    txt = open(glob.glob(str(tmp_path / "t" / "part-*"))[0]).read().splitlines()
    assert txt == ["https://h.test/a", "https://h.test/b", "https://h.test/c"]

    doc = O.format_json(urls).collect()[0]["value"]
    parsed = json.loads(doc)
    assert parsed["total"] == 3
    assert [u["url"] for u in parsed["urls"]] == txt
    assert all("timestamp" in u for u in parsed["urls"])

    csv_rows = O.format_csv(urls).collect()
    assert {r["url"] for r in csv_rows} == set(txt)
    assert all("T" in r["timestamp"] for r in csv_rows)  # RFC3339

    xml = O.xml_document(urls)
    assert xml.startswith('<?xml version="1.0"')
    assert xml.count("<url>") == 3

    try:
        O.write_output(urls, str(tmp_path / "bad"), "yaml")
        raise AssertionError("unsupported format must raise")
    except ValueError as e:
        assert "yaml" in str(e)


def test_distributed_envelope_sinks_at_scale(spark, tmp_path):
    """write_json / write_xml assemble the single-document envelopes
    WITHOUT a driver collect: 10^6 URLs flow head->body->foot through a
    range-partitioned sort and one writer task."""
    import glob
    import json as _json

    from pyspark.sql import functions as F

    n = 1_000_000
    urls = spark.range(n).select(
        F.format_string("https://h%d.test/p%09d", F.col("id") % 50, F.col("id")).alias("url"))

    O.write_output(urls, str(tmp_path / "x"), "xml")
    xf = glob.glob(str(tmp_path / "x" / "part-*"))[0]
    with open(xf) as f:
        head = [next(f) for _ in range(3)]
    assert head[0].startswith('<?xml version="1.0"')
    assert head[1].strip() == "<crawloutput>"
    assert "<url><loc>https://h0.test/p000000000</loc></url>" in head[2]
    out = open(xf).read()
    assert out.rstrip().endswith("</crawloutput>")
    assert out.count("<loc>") == n

    O.write_output(urls, str(tmp_path / "j"), "json")
    jf = glob.glob(str(tmp_path / "j" / "part-*"))[0]
    doc = _json.loads(open(jf).read())
    assert doc["total"] == n
    assert len(doc["urls"]) == n
    assert doc["urls"][0]["url"] == "https://h0.test/p000000000"
    assert "timestamp" in doc and "T" in doc["timestamp"]


def test_xml_escaping(spark):
    df = spark.createDataFrame([("https://h.test/a?x=1&y=<2>",)], "url string")
    xml = O.xml_document(df)
    assert "&amp;" in xml and "&lt;" in xml


def test_write_json_duplicate_min_url(spark, tmp_path):
    """Duplicate minimum URL rows must still yield ONE comma-less body row
    (regression: every min-url occurrence suppressed its comma and the
    document went invalid). write_json dedups like the reference's
    removeDuplicates (output.go)."""
    rows = [("https://h.test/a",), ("https://h.test/a",), ("https://h.test/b",)]
    urls = spark.createDataFrame(rows, "url string")
    out = str(tmp_path / "dup.json")
    O.write_json(urls, out)
    import glob
    text = open(glob.glob(out + "/part-*")[0]).read()
    doc = json.loads(text)
    assert [u["url"] for u in doc["urls"]] == ["https://h.test/a", "https://h.test/b"]
    assert doc["total"] == 2


def test_xml_document_bounded(spark):
    """xml_document must refuse to materialize an unbounded document on
    the driver (VERDICT r3): past max_rows it raises and points at the
    streaming/write paths instead of silently collecting."""
    from pyspark.sql import functions as F
    import pytest

    big = spark.range(1_000_000).select(
        F.concat(F.lit("https://h.test/p"), F.col("id")).alias("url"))
    with pytest.raises(ValueError, match="max_rows"):
        O.xml_document(big)
    # at or under the cap the full document still renders
    small = spark.range(5).select(
        F.concat(F.lit("https://h.test/p"), F.col("id")).alias("url"))
    doc = O.xml_document(small, max_rows=5)
    assert doc.startswith('<?xml') and doc.endswith("</crawloutput>")
    assert doc.count("<loc>") == 5
    with pytest.raises(ValueError, match="max_rows"):
        O.xml_document(small, max_rows=4)
