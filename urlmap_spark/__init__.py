"""urlmap_spark — a PySpark-native URL-frontier crawl engine.

A brand-new reimplementation of the capabilities of aoshimash/urlmap
(a Go BFS web crawler) as a distributed Spark DataFrame program:

- the "web" is a corpus table of image+caption pairs (Iceberg/Parquet);
  a fetch is a join of the frontier against that table,
- each BFS round is one Spark job: fetch-join -> outlink derivation
  (Arrow-vectorized pandas UDF) -> URL canonicalization -> scope
  filters -> first-wins dedup -> anti-join against the URL-seen set,
- per-round atomic checkpoints make crawls resumable,
- politeness (per-host quotas), robots.txt gating and skew handling
  (salting, AQE) are plan properties, not wall-clock mechanisms.

Layout:
    functions/   URL kernel (pandas UDFs + native-expression twins),
                 text analysis, vector math
    operators/   extraction, robots, politeness, seen-set, dedup,
                 similarity, output formatting, stats
    sources/     deterministic corpus/site-graph generator, catalog shim
    plans/       one BFS round + the iterative crawl driver
    streaming/   (reserved) continuous-frontier variant
"""

__version__ = "0.2.0"
