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


def test_host_quota_stream_state_survives_batches(spark, tmp_path):
    """applyInPandasWithState politeness: per-host budget persists
    ACROSS micro-batches (maxFilesPerTrigger=1 forces one batch per
    input file), so a host that exhausts its window budget in batch 1
    stays blocked in batch 2 until the window rolls."""
    import pandas as pd

    from urlmap_spark.streaming.politeness import host_quota_decisions

    src = tmp_path / "events"
    src.mkdir()
    # batch 1: h0 uses its full quota (2) inside window [0, 1000); the
    # null-ts row is malformed (unwindowable) and must be DROPPED by the
    # operator without aborting the query or charging h0's budget
    pd.DataFrame({
        "host": ["h0", "h0", "h1", "h0"],
        "url": ["u0", "u1", "v0", "u_null_ts"],
        "ts": pd.array([0, 10, 5, None], dtype="Int64"),
    }).to_parquet(src / "a_part0.parquet")
    # batch 2: h0 sends two more in the SAME window (blocked) and one
    # after the window rolls (allowed)
    pd.DataFrame({
        "host": ["h0", "h0", "h0", "h1"],
        "url": ["u2", "u3", "u4", "v1"],
        "ts": [20, 900, 1500, 30],
    }).to_parquet(src / "b_part1.parquet")

    stream = (spark.readStream.schema("host string, url string, ts long")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (host_quota_decisions(stream, quota=2, window_ms=1000)
         .writeStream.format("memory").queryName("hq_decisions")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r["url"]: (r["allowed"], r["used"])
            for r in spark.sql("SELECT * FROM hq_decisions").collect()}
    assert "u_null_ts" not in rows  # malformed row dropped, not crashed on
    assert rows["u0"] == (True, 1) and rows["u1"] == (True, 2)
    # state carried into batch 2: budget already exhausted
    assert rows["u2"][0] is False and rows["u3"][0] is False
    # window rolled at ts 1500 -> fresh budget
    assert rows["u4"] == (True, 1)
    # independent host unaffected
    assert rows["v0"][0] is True and rows["v1"][0] is True


def test_windowed_metrics_watermark_drops_late_rows(spark, tmp_path):
    """Event-time tumbling windows over a file-source stream: finalized
    windows emit once in append mode, and a row arriving AFTER the
    watermark passed its window is dropped (bounded state — the
    continuous-crawl requirement)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from urlmap_spark.streaming.metrics import windowed_host_metrics

    inp = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(t0 + dt.timedelta(minutes=m), h, ok) for m, h, ok in specs]

    mtime = [1_700_000_000]
    stamped: set[str] = set()

    def write(batch):
        spark.createDataFrame(batch, "ts timestamp, host string, ok boolean") \
            .coalesce(1).write.mode("append").parquet(inp)
        # FileStreamSource orders batches by modification time; fast
        # consecutive writes tie at ms granularity, so pin strictly
        # increasing mtimes on each write's new files to make arrival
        # order deterministic
        import glob as _g
        mtime[0] += 60
        for f in _g.glob(os.path.join(inp, "*.parquet")):
            if f not in stamped:
                os.utime(f, (mtime[0], mtime[0]))
                stamped.add(f)

    # batch 1: two windows' worth of on-time events
    write(rows((1, "a.test", True), (3, "a.test", False), (12, "b.test", True)))
    # batch 2: far-future event — watermark will pass windows
    # [00:00,00:10) and [00:10,00:20) at the NEXT batch boundary
    write(rows((120, "a.test", True)))
    # batch 3 runs with watermark 01:50: evicts + emits both early
    # windows (watermark state-cleanup happens a batch after the
    # watermark advances — documented Spark semantics)
    write(rows((121, "b.test", True)))
    # batch 4: LATE row for the already-evicted [00:00,00:10) window —
    # must be dropped, not merged and not re-emitted
    write(rows((2, "a.test", True)))

    stream = spark.readStream.schema("ts timestamp, host string, ok boolean") \
        .option("maxFilesPerTrigger", "1").parquet(inp)
    agg = windowed_host_metrics(stream, key_col="host",
                                window_dur="10 minutes", watermark="10 minutes",
                                ok_expr=F.col("ok"))
    q = agg.writeStream.format("memory").queryName("winmet") \
        .outputMode("append").trigger(availableNow=True).start()
    q.awaitTermination(120)
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])

    got = {(r["window_start"].minute, r["host"]): (r["fetches"], r["crawled"])
           for r in spark.sql("SELECT * FROM winmet").collect()}
    # finalized windows carry ONLY the on-time rows; the 02:00/02:01
    # windows are still open (never finalized, so never emitted)
    assert got == {(0, "a.test"): (2, 1), (10, "b.test"): (1, 1)}
    assert dropped == 1  # the late row hit the watermark filter
