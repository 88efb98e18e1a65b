"""Live progress ticker (reference internal/progress/progress.go:
Stats 13-24, ticker loop 162-181, updateProgress 272-298,
displayFinalStats 301-331) — the batch analog folds per-ROUND metrics
and repaints a \\r line from a daemon thread."""

import io
import json
import time

from urlmap_spark import cli
from urlmap_spark.progress import LiveProgressReporter


def _round0():
    return {"round": 0, "frontier": 1, "new_discovered": 6,
            "skipped_depth": 0, "blocked_robots": 0,
            "processed": 1, "failed": 0, "wall_s": 0.1}


def test_ticker_paints_and_final_block():
    out = io.StringIO()
    r = LiveProgressReporter(spark=None, output=out, update_interval=0.02)
    r.start()
    r.on_round(_round0())
    time.sleep(0.12)
    mid = out.getvalue()
    # mid-crawl format (progress.go:281-288): queue > 0
    assert "\rCrawling: 1/7 URLs processed" in mid
    assert "6 queued]" in mid
    r.on_round({"round": 1, "frontier": 6, "new_discovered": 0,
                "skipped_depth": 1, "blocked_robots": 0,
                "processed": 6, "failed": 2, "wall_s": 0.1})
    time.sleep(0.12)
    # drained format (progress.go:289-295): queue == 0
    assert "\rProcessed: 7 URLs" in out.getvalue()
    r.stop()
    txt = out.getvalue()
    assert "Crawling completed in" in txt
    assert "URLs discovered: 7" in txt  # seeds(1) + new(6)
    assert "URLs processed:  7" in txt
    assert "URLs failed:     2" in txt
    assert "URLs skipped:    1" in txt
    assert "Average rate:" in txt


def test_final_block_omits_zero_failed_skipped():
    """progress.go:316-322: failed/skipped lines only when > 0."""
    out = io.StringIO()
    r = LiveProgressReporter(spark=None, output=out, update_interval=60)
    r.start()
    r.on_round(_round0())
    r.stop()
    txt = out.getvalue()
    assert "URLs failed:" not in txt
    assert "URLs skipped:" not in txt
    assert "URLs processed:  1" in txt


def test_quiet_before_first_round_and_show_progress_false():
    # nothing painted while all counters are zero (progress.go:275-277)
    out = io.StringIO()
    r = LiveProgressReporter(spark=None, output=out, update_interval=0.02)
    r.start()
    time.sleep(0.08)
    assert out.getvalue() == ""
    r.cancel()
    assert out.getvalue() == ""  # cancel = error path, no final block
    # ShowProgress=false: Start/Stop are no-ops (progress.go:162-164, 302-304)
    out2 = io.StringIO()
    q = LiveProgressReporter(spark=None, output=out2, update_interval=0.02,
                             show_progress=False)
    q.start()
    q.on_round(_round0())
    q.stop()
    assert out2.getvalue() == ""


def test_deferred_metrics_estimate_then_finalize():
    """A deferred-fold round dict (no 'processed' key) is estimated as
    frontier - skipped; finalize() replaces estimates with the folded
    truth."""
    out = io.StringIO()
    r = LiveProgressReporter(spark=None, output=out, update_interval=60)
    r.on_round({"round": 0, "frontier": 10, "new_discovered": 3,
                "skipped_depth": 2, "blocked_robots": 1, "wall_s": 0.1})
    assert r.get_stats()["processed"] == 7  # 10 - 2 - 1
    assert r.get_stats()["discovered"] == 13  # seeds 10 + new 3
    folded = [{"round": 0, "frontier": 10, "new_discovered": 3,
               "skipped_depth": 2, "blocked_robots": 1,
               "processed": 6, "failed": 4, "wall_s": 0.1}]
    r.finalize(folded)
    s = r.get_stats()
    assert s["processed"] == 6 and s["failed"] == 4 and s["skipped"] == 3
    assert s["discovered"] == 13 and s["queue_size"] == 3


def test_active_tasks_poll_is_safe(spark):
    """The status-tracker poll never raises, with or without work."""
    r = LiveProgressReporter(spark=spark, output=io.StringIO(),
                             update_interval=60)
    assert r._active_tasks() >= 0


def _corpus(spark):
    rows = [("https://h.test/", " ".join(f'href="/p{i}"' for i in range(6)), 200)]
    rows += [(f"https://h.test/p{i}", 'href="/"', 200) for i in range(6)]
    return spark.createDataFrame(rows, "url string, caption string, status int")


def test_cli_progress_live_ticker(spark, tmp_path, capsys, monkeypatch):
    """--progress (text mode) runs the live ticker end-to-end: final
    stats block on stderr, JSON summary still the last line."""
    monkeypatch.setenv("URLMAP_PROGRESS_INTERVAL", "0.05")
    corpus_p = str(tmp_path / "tick.parquet")
    _corpus(spark).write.parquet(corpus_p)
    rc = cli.main([
        "https://h.test/", "--corpus", corpus_p,
        "--no-path-prefix", "--output", str(tmp_path / "tout"),
        "--progress",
    ], _spark=spark)
    assert rc == 0
    err = capsys.readouterr().err
    assert "Crawling completed in" in err
    assert "URLs discovered: 7" in err
    assert "URLs processed:  7" in err
    assert "Average rate:" in err
    lines = err.splitlines()
    summary = json.loads(lines[-1])
    assert summary["processed"] == 7
    # the final block precedes the summary
    assert any("Crawling completed" in l for l in lines[:-1])
