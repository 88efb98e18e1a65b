"""Politeness scheduling: per-host quotas (salted two-phase top-k),
global cap, delay-never-drop semantics (reference crawl-delay:
internal/crawler/crawler.go:603-606; rate limiter: progress.go:108-159)."""

import pandas as pd
from pyspark.sql import functions as F

from urlmap_spark.operators.politeness import quota_from_delays, schedule_frontier
from urlmap_spark.plans.crawl import CrawlConfig, crawl
from urlmap_spark.plans.oracle import oracle_bfs
from urlmap_spark.sources import corpus as C


def _frontier(spark, rows):
    return spark.createDataFrame(rows, "url string, depth int, `order` long")


def test_per_host_quota_earliest_wins(spark):
    rows = [(f"https://h{i % 2}.test/p{i}", 1, i) for i in range(10)]
    fr = _frontier(spark, rows)
    sched, deferred = schedule_frontier(fr, default_quota=2)
    s = sorted((r["url"], r["order"]) for r in sched.collect())
    d = sorted(r["order"] for r in deferred.collect())
    # per host: the 2 lowest-order rows win
    assert [o for _, o in s] == [0, 2, 1, 3] or sorted(o for _, o in s) == [0, 1, 2, 3]
    assert d == [4, 5, 6, 7, 8, 9]
    # nothing lost
    assert len(s) + len(d) == 10


def test_global_cap(spark):
    rows = [(f"https://h{i}.test/", 1, i) for i in range(8)]
    sched, deferred = schedule_frontier(_frontier(spark, rows), global_cap=3)
    assert sorted(r["order"] for r in sched.collect()) == [0, 1, 2]
    assert sorted(r["order"] for r in deferred.collect()) == [3, 4, 5, 6, 7]


def test_quota_from_delays(spark):
    delays = spark.createDataFrame(
        [("a.test", 2.0), ("b.test", 100.0)], "host string, crawl_delay_s double")
    q = {r["host"]: r["quota"] for r in quota_from_delays(delays, 10.0).collect()}
    assert q == {"a.test": 5, "b.test": 1}  # floor(10/2); min 1 keeps progress


def test_quota_crawl_delays_but_never_drops(spark):
    """A quota-limited crawl must reach the SAME final URL-seen set as an
    unlimited crawl (politeness delays, never drops — the plan-property
    analog of crawl-delay sleeps), just over more rounds."""
    pdf = C.corpus_pandas(seed=7, n_hosts=3, total_pages=40, with_bytes=False)
    cdf = spark.createDataFrame(pdf)
    seed_url = "https://h0.example-7.test/"
    free = crawl(spark, cdf, seed_url, CrawlConfig(max_depth=3, same_path_prefix=False))
    slow = crawl(spark, cdf, seed_url, CrawlConfig(
        max_depth=3, same_path_prefix=False, default_quota=3))
    urls_free = {r["url"] for r in free.results.collect()}
    urls_slow = {r["url"] for r in slow.results.collect()}
    assert urls_slow == urls_free
    assert slow.rounds > free.rounds  # quota stretched the schedule
    # oracle agreement on the seen set
    _, stats = oracle_bfs(pdf, seed_url, max_depth=3, same_path_prefix=False)
    assert sum(m["processed"] for m in slow.metrics) == len(urls_free)


def test_salting_bounds_hot_host_partitions(spark):
    """Zipf-hot host rows spread across salts in phase 1 (north_rule skew
    mitigation): with one dominant host, phase-1 ranks are computed per
    (host, salt) so no single task sees the whole host."""
    rows = [(f"https://hot.test/p{i}", 1, i) for i in range(2000)]
    rows += [(f"https://cold{i}.test/", 1, 2000 + i) for i in range(5)]
    sched, deferred = schedule_frontier(_frontier(spark, rows), default_quota=50,
                                        n_salts=8)
    s = [r for r in sched.collect()]
    hot = [r for r in s if "hot.test" in r["url"]]
    assert len(hot) == 50
    # earliest 50 by order win despite salting (two-phase re-rank is exact)
    assert sorted(r["order"] for r in hot) == list(range(50))
    assert len([r for r in s if "cold" in r["url"]]) == 5


def test_global_cap_has_no_partitionless_window(spark):
    """Phase 2 of the global cap uses the count-offset rank, not a
    Window.orderBy() without partitionBy — a cap of 10^7 must never put
    cap_salts*cap rows into one task. Every window in the plan carries a
    partition spec."""
    rows = [(f"https://h{i % 5}.test/p{i}", 1, i) for i in range(500)]
    sched, deferred = schedule_frontier(_frontier(spark, rows), global_cap=100)
    assert sorted(r["order"] for r in sched.collect()) == list(range(100))
    assert deferred.count() == 400
    for df in (sched, deferred):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # a partitionless window compiles to an Exchange SinglePartition
        # feeding the Window — the plan must have none anywhere
        assert "SinglePartition" not in plan, plan
