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


def test_seen_layout_is_bucketed_and_join_prunes(spark, tmp_path):
    """The persisted seen set is hash-bucketed on disk (partitionBy) and
    each micro-batch's anti-join reads ONLY the buckets its URLs hash to
    — at 10^10 seen rows the per-batch scan is proportional to the
    batch, not the history."""
    import glob

    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ing = StreamingSeenIngest(spark, state)
    _write_urls(spark, inp, [f"https://h{i}.test/p{i}" for i in range(40)])
    ing.run_available_now(inp)

    # bucketed directory layout
    parts = glob.glob(os.path.join(state, "seen", "bucket=*"))
    assert len(parts) > 1
    # batch urls hash to a strict subset of buckets -> pruned read
    batch = spark.createDataFrame([("https://h1.test/p1",)], "url string")
    pruned = ing.pruned_seen_for(batch)
    assert pruned is not None
    assert 0 < pruned.count() < ing.seen_count()

    # correctness unchanged: overlap deduped, new urls land in buckets
    _write_urls(spark, inp, ["https://h1.test/p1", "https://new.test/q"])
    ing.run_available_now(inp)
    assert ing.seen_count() == 41


def test_legacy_flat_seen_layout_migrates(spark, tmp_path):
    """A state_dir whose seen/ was written by the old FLAT layout (row
    files without a bucket partition) is migrated into buckets on init,
    so resume keeps exactly-once dedup instead of breaking partition
    discovery."""
    import glob

    state = str(tmp_path / "state")
    seen = os.path.join(state, "seen")
    # simulate the old layout: plain parquet files directly in seen/
    spark.createDataFrame(
        [("https://old.test/a",), ("https://old.test/b",)], "url string"
    ).coalesce(1).write.mode("overwrite").parquet(seen)
    for f in glob.glob(os.path.join(seen, "_SUCCESS")):
        os.remove(f)
    assert glob.glob(os.path.join(seen, "part-*"))

    ing = StreamingSeenIngest(spark, state)
    # flat files gone, bucketed layout in place, rows preserved
    assert not glob.glob(os.path.join(seen, "part-*"))
    assert glob.glob(os.path.join(seen, "bucket=*"))
    assert ing.seen_count() == 2

    # ingest dedups against the migrated rows
    inp = str(tmp_path / "in")
    _write_urls(spark, inp, ["https://old.test/a", "https://new.test/c"])
    ing.run_available_now(inp)
    assert ing.seen_count() == 3
