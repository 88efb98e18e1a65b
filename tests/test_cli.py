"""CLI surface: --version, robots Crawl-delay -> per-host quota wiring,
sitemap surfacing (reference: cmd/urlmap/main.go flags + version cmd,
crawler.go:603-606 crawl-delay application)."""

import json

import pytest

from urlmap_spark import __version__, cli

ROBOTS = [
    ("h.test", 0, "User-agent: *"),
    ("h.test", 1, "Crawl-delay: 10"),
    ("h.test", 2, "Sitemap: https://h.test/sitemap.xml"),
]


def test_version_flag(capsys):
    with pytest.raises(SystemExit) as e:
        cli.main(["--version"])
    assert e.value.code == 0
    assert f"urlmap-spark version {__version__}" in capsys.readouterr().out


def _corpus(spark):
    # root links to 6 children; children link back to root
    rows = [("https://h.test/", " ".join(f'href="/p{i}"' for i in range(6)), 200)]
    rows += [(f"https://h.test/p{i}", 'href="/"', 200) for i in range(6)]
    return spark.createDataFrame(rows, "url string, caption string, status int")


def test_crawl_delay_becomes_quota(spark, tmp_path, capsys):
    """--respect-robots + robots-lines with Crawl-delay: 10 and
    --round-budget 30 -> 3 fetches/round for h.test; overflow defers
    (never drops) so the final URL set is complete."""
    corpus_p = str(tmp_path / "corpus.parquet")
    robots_p = str(tmp_path / "robots.parquet")
    out_p = str(tmp_path / "out")
    _corpus(spark).write.parquet(corpus_p)
    spark.createDataFrame(ROBOTS, "host string, lineno int, line string") \
        .write.parquet(robots_p)

    rc = cli.main([
        "https://h.test/", "--corpus", corpus_p,
        "--respect-robots", "--robots-lines", robots_p,
        "--round-budget", "30", "--no-path-prefix",
        "--output", out_p,
    ], _spark=spark)
    assert rc == 0
    summary = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    # 7 URLs at <=3/round (seed round processes 1) -> at least 3 rounds
    assert summary["processed"] == 7
    assert summary["rounds"] >= 3
    assert summary["sitemaps"] == 1

    import glob

    txt = open(glob.glob(out_p + "/part-*")[0]).read().splitlines()
    assert txt == sorted(["https://h.test/"] + [f"https://h.test/p{i}" for i in range(6)])
