"""JS/SPA render path: static detection, dynamic verification, unified
fetch dispatch, and the crawl consuming render modes end-to-end
(reference: internal/detector/spa_detector.go, internal/client/
unified_client.go:77-119)."""

import pandas as pd
from pyspark.sql import functions as F

from urlmap_spark.operators.stats import (
    dispatch_content,
    dynamic_verify,
    host_profile,
    render_modes,
)

SPA_MARK = '<div id="root"></div> react loading'


def _pages(spark):
    # spa.test serves SPA shells: zero static links, links appear only
    # after JS rendering; one page's render failed (None -> fallback).
    # static.test serves ordinary server-rendered pages.
    rows = [
        ("https://spa.test/", SPA_MARK, SPA_MARK + ' href="/a" href="/b"', 200),
        ("https://spa.test/a", SPA_MARK, SPA_MARK + ' href="/b"', 200),
        ("https://spa.test/b", SPA_MARK, None, 200),
        ("https://static.test/", 'plain page href="/x"', None, 200),
        ("https://static.test/x", 'plain page href="/"', None, 200),
    ]
    return spark.createDataFrame(
        rows, "url string, caption string, rendered_caption string, status int")


def test_dynamic_verify_goldens(spark):
    """VerifyWithJS math (spa_detector.go:229-262): static==0 ->
    is_spa = js>0, confidence=min(js,1); else ratio rule."""
    out = {r["url"]: r for r in dynamic_verify(_pages(spark)).collect()}
    r = out["https://spa.test/"]
    assert (r["n_static"], r["n_js"], r["is_spa"], r["confidence"]) == (0, 2, True, 1.0)
    r = out["https://spa.test/b"]  # render failed -> fallback == static
    assert (r["n_static"], r["n_js"], r["is_spa"]) == (0, 0, False)
    r = out["https://static.test/"]  # 1 -> 1 links: ratio 0, not SPA
    assert (r["n_static"], r["n_js"], r["is_spa"], r["confidence"]) == (1, 1, False, 0.0)


def test_dynamic_verify_ratio_rule(spark):
    """static>0: SPA iff links grow by >50% (spa_detector.go:244-262)."""
    rows = [("https://h.test/grow", 'href="/a" href="/b"',
             'href="/a" href="/b" href="/c" href="/d"'),
            ("https://h.test/flat", 'href="/a" href="/b"', 'href="/a" href="/b" href="/c"')]
    df = spark.createDataFrame(rows, "url string, caption string, rendered_caption string")
    out = {r["url"]: r for r in dynamic_verify(df).collect()}
    assert out["https://h.test/grow"]["is_spa"] is True
    assert out["https://h.test/grow"]["confidence"] == 1.0
    assert out["https://h.test/flat"]["is_spa"] is False  # +50% is not >50%
    assert out["https://h.test/flat"]["confidence"] == 0.5


def test_render_modes_static_plus_dynamic(spark):
    modes = {r["host"]: r["use_js"] for r in render_modes(_pages(spark)).collect()}
    assert modes == {"spa.test": True, "static.test": False}
    # without a rendered column the static detector decides alone
    static_only = render_modes(_pages(spark).drop("rendered_caption"),
                               rendered_col=None)
    m2 = {r["host"]: r["use_js"] for r in static_only.collect()}
    assert m2["spa.test"] is True  # framework + structure markers
    assert m2["static.test"] is False


def test_dispatch_content(spark):
    modes = render_modes(_pages(spark))
    got = {r["url"]: r for r in dispatch_content(_pages(spark), modes).collect()}
    # JS host with a rendered body -> rendered content wins
    assert 'href="/a"' in got["https://spa.test/"]["caption"]
    assert got["https://spa.test/"]["render_mode"] is True
    # JS host whose render failed -> HTTP fallback (static body)
    assert got["https://spa.test/b"]["caption"] == SPA_MARK
    assert got["https://spa.test/b"]["render_mode"] is False
    # non-JS host untouched
    assert got["https://static.test/"]["caption"] == 'plain page href="/x"'
    assert got["https://static.test/"]["render_mode"] is False
    assert "rendered_caption" not in dispatch_content(_pages(spark), modes).columns


def test_crawl_consumes_render_modes(spark):
    """End-to-end #3/#4/#27: a crawl over an SPA host discovers outlinks
    only when the render path is wired; (url, depth, order) matches the
    oracle BFS run over the effective (as-rendered) web."""
    from urlmap_spark.plans.crawl import CrawlConfig, crawl
    from urlmap_spark.plans.oracle import oracle_bfs

    pages = _pages(spark)
    modes = render_modes(pages)

    run = crawl(spark, pages, "https://spa.test/",
                CrawlConfig(render_modes=modes))
    got = [(r["url"], r["depth"], r["order"])
           for r in run.results.orderBy("order").collect()]
    assert [u for u, _, _ in got] == [
        "https://spa.test/", "https://spa.test/a", "https://spa.test/b"]
    assert sum(m.get("rendered", 0) for m in run.metrics) == 2

    # oracle parity over the as-rendered web
    pdf = pages.toPandas()
    eff = pdf.assign(caption=pdf.apply(
        lambda r: r.rendered_caption
        if r.url.startswith("https://spa.test") and isinstance(r.rendered_caption, str)
        else r.caption, axis=1))[["url", "caption", "status"]]
    eres, _ = oracle_bfs(eff, "https://spa.test/")
    assert got == [(r.url, r.depth, r.order) for r in eres]

    # without the render path the SPA shell yields no outlinks
    run2 = crawl(spark, pages.drop("rendered_caption"), "https://spa.test/",
                 CrawlConfig())
    assert run2.results.count() == 1
