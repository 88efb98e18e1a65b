"""Per-row payload invariants (input_hint): decoded pixels, captions,
phash — over the binary image column, end-to-end through the crawl."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from urlmap_spark.operators.multimodal import decode_meta, payload_ok_udf, resize, verify_payload
from urlmap_spark.plans.crawl import CrawlConfig, crawl
from urlmap_spark.sources import corpus as C


@pytest.fixture(scope="module")
def bytes_corpus():
    return C.corpus_pandas(seed=42, n_hosts=3, total_pages=40, with_bytes=True)


def test_verify_payload_all_rows(spark, bytes_corpus):
    rep = verify_payload(spark.createDataFrame(bytes_corpus), seed=42, n_hosts=3,
                         total_pages=40).collect()
    assert len(rep) == 40
    assert all(r["pixels_ok"] for r in rep), "decoded pixels must allclose the reference"
    assert all(r["caption_ok"] for r in rep), "captions must be byte-equal"
    assert all(r["phash_ok"] for r in rep)


def test_decode_meta_and_resize(spark, bytes_corpus):
    df = spark.createDataFrame(bytes_corpus)
    meta = decode_meta(df).collect()
    assert all(r["decode_ok"] for r in meta)
    orig = {r.image_id: (r.w, r.h) for r in bytes_corpus.itertuples()}
    for r in meta:
        assert (r["w"], r["h"]) == orig[r["image_id"]]
    small = resize(df, 16, 16).collect()
    for r in small:
        arr = C.decode_ppm(bytes(r["bytes"]))
        assert arr.shape == (16, 16, 3)


def test_unsupported_codec_is_poison_pill_row(spark):
    rows = [{"image_id": "x/jpeg1", "bytes": b"\xff\xd8\xff\xe0fakejpeg", "fmt": "jpeg"}]
    out = decode_meta(spark.createDataFrame(pd.DataFrame(rows))).collect()
    assert len(out) == 1 and not out[0]["decode_ok"]


def test_null_and_truncated_bytes_are_isolated(spark):
    """Failure classes BEYOND the decoder's own ValueError — null bytes
    (TypeError on the buffer slice), a truncated PNG chunk header
    (struct.error), an unparseable image_id (ValueError outside the
    decoder) — are isolation cases at 10^10 rows, never job aborts:
    decode_meta reports decode_ok=False, resize drops the row,
    verify_payload reports a failed-verification row."""
    df = spark.createDataFrame(
        [("h0.example-42.test/index", None, "ppm", "x", 0),
         ("h1.example-42.test/p1",
          b"\x89PNG\r\n\x1a\n\x00\x00", "png", "x", 0),
         ("not-a-corpus-id", None, "ppm", "x", 0)],
        "image_id string, bytes binary, fmt string, caption string, phash long")
    meta = decode_meta(df).collect()
    assert len(meta) == 3 and not any(r["decode_ok"] for r in meta)
    assert resize(df, 8, 8).count() == 0
    rep = verify_payload(df, seed=42, n_hosts=3, total_pages=40).collect()
    assert len(rep) == 3
    assert not any(r["pixels_ok"] or r["caption_ok"] or r["phash_ok"]
                   for r in rep)


def test_crawl_with_payload_verification(spark, bytes_corpus):
    """Every successfully fetched page must pass the decoded-phash check
    — including pages reached through the left-join fetch where corpus
    columns become NULLABLE (regression: nullable int64 phash crossing
    Arrow->pandas as float64 silently broke every comparison)."""
    run = crawl(spark, spark.createDataFrame(bytes_corpus), "https://h0.example-42.test/",
                CrawlConfig(max_depth=3, same_path_prefix=False, verify_payload=True))
    crawled = sum(m["crawled"] for m in run.metrics)
    verified = sum(m.get("payload_ok", 0) for m in run.metrics)
    assert crawled > 5  # multi-round reach
    assert verified == crawled


def test_payload_udf_rejects_corrupted_bytes(spark, bytes_corpus):
    df = spark.createDataFrame(bytes_corpus).withColumn(
        "bytes", F.expr("substring(bytes, 1, 100)"))  # truncate payloads
    out = df.select(payload_ok_udf(
        F.col("bytes"), F.col("fmt"), F.col("phash")).alias("ok")).collect()
    assert not any(r["ok"] for r in out)


def test_payload_udf_accepts_intact_bytes(spark, bytes_corpus):
    df = spark.createDataFrame(bytes_corpus)
    out = df.select(payload_ok_udf(
        F.col("bytes"), F.col("fmt"), F.col("phash")).alias("ok")).collect()
    assert all(r["ok"] for r in out)


def test_ramp_images_decode_to_closed_form(spark):
    """synth_ramp_images -> the REAL decode path reproduces the
    closed-form pixels and the integer-exact phash (the invariant the
    image-phash-arith oracle states in SQL)."""
    import numpy as np

    from urlmap_spark.operators.multimodal import (
        decode_meta, ramp_dims_of, ramp_pixels_of, synth_ramp_images)
    from urlmap_spark.sources.corpus import phash_of

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    meta = {r["image_id"]: r for r in decode_meta(synth_ramp_images(ids)).collect()}
    assert len(meta) == 20
    for did in range(20):
        m = meta[f"i{did}"]
        w, h = ramp_dims_of(did)
        assert m["decode_ok"] and (m["w"], m["h"]) == (w, h)
        arr = ramp_pixels_of(did)
        assert m["phash"] == phash_of(arr)
        assert abs(m["mean_lum"] - arr.mean()) < 1e-9
