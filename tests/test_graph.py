"""Host graph + PageRank (operators/graph.py).

Float path is pinned against a driver-side numpy power iteration with
the identical dangling rule; the int twin against a pure-Python
fixed-point reference (the same arithmetic the DuckDB oracle runs).
Partition invariance: the int twin must be bit-exact under re-layout;
the float path approximately (its shuffled double sums may reorder).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from urlmap_spark.operators.graph import host_edges, pagerank, pagerank_int


def _edges_df(spark, triples, parts=4):
    return spark.createDataFrame(
        [(s, d, int(c)) for s, d, c in triples],
        "src_host string, dst_host string, cnt long",
    ).repartition(parts)


TRIPLES = [
    ("a.test", "b.test", 3), ("a.test", "c.test", 1),
    ("b.test", "c.test", 2), ("c.test", "a.test", 5),
    ("d.test", "a.test", 1),              # d has no in-edges
    ("e.test", "e.test", 2),              # self-loop
    ("b.test", "sink.test", 1),           # sink.test is dangling
]


def _py_pagerank_int(triples, iters, dn=17, dd=20, scale=10**9):
    nodes = sorted({s for s, _, _ in triples} | {d for _, d, _ in triples})
    n = len(nodes)
    out_w = {}
    for s, _, c in triples:
        out_w[s] = out_w.get(s, 0) + c
    base = ((dd - dn) * scale) // (dd * n)
    rank = {h: scale // n for h in nodes}
    for _ in range(iters):
        nxt = {h: base for h in nodes}
        for s, d, c in triples:
            nxt[d] += (rank[s] * dn * c) // (dd * out_w[s])
        rank = nxt
    return rank


def _py_pagerank_float(triples, iters, d=0.85):
    nodes = sorted({s for s, _, _ in triples} | {dd for _, dd, _ in triples})
    n = len(nodes)
    out_w = {}
    for s, _, c in triples:
        out_w[s] = out_w.get(s, 0) + c
    rank = {h: 1.0 / n for h in nodes}
    for _ in range(iters):
        nxt = {h: (1.0 - d) / n for h in nodes}
        for s, dst, c in triples:
            nxt[dst] += d * rank[s] * c / out_w[s]
        rank = nxt
    return rank


def test_host_edges_extracts_and_counts(spark):
    links = spark.createDataFrame(
        [
            ("https://A.test/p1", "https://b.test:8080/x"),
            ("https://a.test/p2", "https://B.test/y"),
            ("https://a.test/p3", "https://a.test/p1"),
            ("notaurl", "https://b.test/z"),      # unparseable src dropped
            ("https://c.test/q", "mailto:a@b"),   # no host dst dropped
        ],
        "src_url string, dst_url string",
    )
    got = {(r.src_host, r.dst_host): r.cnt for r in host_edges(links).collect()}
    # hosts lowercased, port stripped; (a.test -> b.test) collapses to cnt=2
    assert got == {("a.test", "b.test"): 2, ("a.test", "a.test"): 1}


def test_pagerank_int_matches_python_reference(spark):
    want = _py_pagerank_int(TRIPLES, iters=3)
    got = {r.host: r.rank_int for r in pagerank_int(_edges_df(spark, TRIPLES), iters=3).collect()}
    assert got == want


@pytest.mark.parametrize("parts", [1, 7])
def test_pagerank_int_partition_invariant(spark, parts):
    want = _py_pagerank_int(TRIPLES, iters=4)
    df = _edges_df(spark, TRIPLES, parts=parts)
    got = {r.host: r.rank_int for r in pagerank_int(df, iters=4).collect()}
    assert got == want


def test_pagerank_float_matches_power_iteration(spark):
    want = _py_pagerank_float(TRIPLES, iters=10)
    got = {r.host: r.rank for r in pagerank(_edges_df(spark, TRIPLES), iters=10).collect()}
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], rel=1e-12, abs=1e-15)
    # mass leaks through the dangling sink but never exceeds 1
    assert sum(got.values()) <= 1.0 + 1e-9


def test_pagerank_int_tracks_float_ordering(spark):
    """The fixed-point twin must induce the same host ranking as the
    float path (the twin exists to value-check the mechanism)."""
    df = _edges_df(spark, TRIPLES)
    fl = {r.host: r.rank for r in pagerank(df, iters=3).collect()}
    it = {r.host: r.rank_int for r in pagerank_int(df, iters=3).collect()}
    # identical deterministic tie-break on BOTH sides (ADVICE r5 #3):
    # equal ranks would otherwise compare dict-insertion order against
    # a (rank, host) sort and flake
    assert (sorted(fl, key=lambda h: (fl[h], h))
            == sorted(it, key=lambda h: (it[h], h)))


def test_pagerank_empty_and_zero_iters(spark):
    empty = _edges_df(spark, [], parts=1)
    assert pagerank(empty, iters=3).count() == 0
    assert pagerank_int(empty, iters=3).count() == 0
    r0 = {r.host: r.rank_int
          for r in pagerank_int(_edges_df(spark, TRIPLES), iters=0).collect()}
    n = len({s for s, _, _ in TRIPLES} | {d for _, d, _ in TRIPLES})
    assert set(r0.values()) == {10**9 // n}


def test_pagerank_rejects_bad_params(spark):
    df = _edges_df(spark, TRIPLES)
    with pytest.raises(ValueError):
        pagerank(df, iters=-1)
    with pytest.raises(ValueError):
        pagerank_int(df, damping_num=20, damping_den=20)


def test_pagerank_rank_feeds_priority(spark):
    """Ranks broadcast back onto a frontier as a priority column — the
    consumption path (politeness.priority_schedule sorts by any numeric
    priority)."""
    ranks = pagerank_int(_edges_df(spark, TRIPLES), iters=2)
    frontier = spark.createDataFrame(
        [("https://c.test/p1", "c.test"), ("https://sink.test/p2", "sink.test"),
         ("https://nowhere.test/p3", "nowhere.test")],
        "url string, host string",
    )
    pri = (
        frontier.join(F.broadcast(ranks), frontier.host == ranks.host, "left")
        .select("url", F.coalesce("rank_int", F.lit(0).cast("long")).alias("priority"))
    )
    rows = {r.url: r.priority for r in pri.collect()}
    assert rows["https://nowhere.test/p3"] == 0
    assert rows["https://c.test/p1"] > rows["https://sink.test/p2"] > 0


def test_priority_expr_from_ranks_lookup(spark):
    from urlmap_spark.operators.graph import priority_expr_from_ranks

    ranks = spark.createDataFrame(
        [("a.test", 70), ("b.test", 30)], "host string, rank_int long")
    expr = priority_expr_from_ranks(ranks)
    fr = spark.createDataFrame(
        [("https://A.test:8080/p1",), ("https://b.test/p2",), ("https://z.test/p3",)],
        "url string")
    got = {r.url: r.p for r in fr.select("url", F.expr(expr).alias("p")).collect()}
    assert got["https://A.test:8080/p1"] == 70   # case + port normalized
    assert got["https://b.test/p2"] == 30
    assert got["https://z.test/p3"] is None      # unknown host -> NULL -> defers

    empty = spark.createDataFrame([], "host string, rank_int long")
    assert fr.select(F.expr(priority_expr_from_ranks(empty))).collect()[0][0] is None

    with pytest.raises(ValueError, match="max_hosts"):
        priority_expr_from_ranks(ranks, max_hosts=1)
    bad = spark.createDataFrame([("a'b.test", 1)], "host string, rank_int long")
    with pytest.raises(ValueError, match="not inlinable"):
        priority_expr_from_ranks(bad)


def test_pagerank_priority_drives_crawl(spark):
    """End to end: crawl -> host link graph -> pagerank_int ->
    priority_expr_from_ranks -> re-crawl under a budget. The prioritized
    crawl reaches the same URL-seen set (delay never drop) and its
    schedule visibly follows the ranks (opposite priorities produce
    different round sequences)."""
    from dataclasses import replace

    from urlmap_spark.operators.extract import extract_outlinks
    from urlmap_spark.plans.crawl import CrawlConfig, crawl
    from urlmap_spark.operators.graph import (
        host_edges, pagerank_int, priority_expr_from_ranks)
    from urlmap_spark.sources import corpus as C

    pdf = C.corpus_pandas(seed=17, n_hosts=3, total_pages=24, with_bytes=False)
    cdf = spark.createDataFrame(pdf)
    seed_url = "https://h0.example-17.test/"
    # open-web crawl (scope off): the frontier mixes hosts, so a host-rank
    # priority has real choices to make under the global cap
    base = CrawlConfig(max_depth=30, same_domain=False, same_path_prefix=False,
                       global_cap=3, max_rounds=80)
    fifo = crawl(spark, cdf, seed_url, base)

    pages = fifo.results.where("ok").join(cdf.select("url", "caption"), "url")
    links = extract_outlinks(pages).select(
        F.col("url").alias("src_url"), F.col("outlink").alias("dst_url"))
    ranks = pagerank_int(host_edges(links), iters=3)
    assert ranks.count() > 1
    expr = priority_expr_from_ranks(ranks)

    hi = crawl(spark, cdf, seed_url, replace(base, priority_expr=expr))
    lo = crawl(spark, cdf, seed_url, replace(base, priority_expr=f"-({expr})"))
    want = {r["url"] for r in fifo.results.collect()}
    assert {r["url"] for r in hi.results.collect()} == want
    assert {r["url"] for r in lo.results.collect()} == want
    # opposite priorities genuinely reorder the schedule
    hi_seq = [m["crawled"] for m in hi.metrics]
    lo_seq = [m["crawled"] for m in lo.metrics]
    hi_hosts = [r["url"] for r in hi.results.orderBy("order").collect()]
    lo_hosts = [r["url"] for r in lo.results.orderBy("order").collect()]
    assert hi_seq != lo_seq or hi_hosts != lo_hosts


@pytest.mark.parametrize("fn_iters", [("int", 3), ("float", 4)])
def test_pagerank_string_fallback_parity(spark, fn_iters):
    """The collision-fallback path (key_encoding='string') must produce
    results identical to the id-encoded default — same grouping, same
    arithmetic, only the shuffle key representation differs."""
    kind, iters = fn_iters
    df = _edges_df(spark, TRIPLES)
    if kind == "int":
        a = {r.host: r.rank_int
             for r in pagerank_int(df, iters=iters).collect()}
        b = {r.host: r.rank_int
             for r in pagerank_int(df, iters=iters, key_encoding="string").collect()}
        assert a == b
    else:
        a = {r.host: r.rank for r in pagerank(df, iters=iters).collect()}
        b = {r.host: r.rank
             for r in pagerank(df, iters=iters, key_encoding="string").collect()}
        assert set(a) == set(b)
        for h in a:
            assert a[h] == pytest.approx(b[h], rel=1e-12)
    with pytest.raises(ValueError, match="key_encoding"):
        pagerank_int(df, key_encoding="bogus")
