"""Streaming seen-set ingestion: incremental, exactly-once-per-batch,
dedup across micro-batches and restarts."""

import os

from urlmap_spark.streaming.ingest import StreamingSeenIngest


def _write_urls(spark, path, urls, mode="append"):
    spark.createDataFrame([(u,) for u in urls], "url string") \
        .coalesce(1).write.mode(mode).parquet(path)


def test_incremental_ingest_dedups_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ing = StreamingSeenIngest(spark, state)

    _write_urls(spark, inp, ["https://a.test/x", "https://a.test/y/",
                             "https://a.test/x#frag", "ftp://skip.test/"])
    ing.run_available_now(inp)
    # normalization collapses /x and /x#frag; trailing slash stripped; ftp dropped
    assert ing.seen_count() == 2

    # second drop: one overlap, one new
    _write_urls(spark, inp, ["https://a.test/x", "https://b.test/z"])
    ing.run_available_now(inp)
    assert ing.seen_count() == 3

    # re-running with no new files is a no-op (exactly-once per file)
    ing.run_available_now(inp)
    assert ing.seen_count() == 3

    # a fresh ingester over the same state dir resumes, not restarts
    ing2 = StreamingSeenIngest(spark, state)
    _write_urls(spark, inp, ["https://b.test/z", "https://c.test/w"])
    ing2.run_available_now(inp)
    assert ing2.seen_count() == 4
