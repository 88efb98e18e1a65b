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
                 text analysis (langid/quality/tokens/fingerprints/PII)
    operators/   extraction, robots, politeness, seen-set (bloom/cuckoo/
                 disk), dedup (exact/ngram/minhash/simhash/embedding/
                 winnow), connected components, similarity + alignment,
                 multimodal (image/audio/video), decontam, line dedup,
                 quality classifier, sampling/packing, output, stats
    sources/     deterministic corpus/site-graph generator, catalog shim
    plans/       one BFS round + the iterative crawl driver, curation,
                 checkpoint maintenance
    streaming/   continuous ingest (foreachBatch seen table) + stateful
                 per-host politeness, windowed stream metrics
    progress.py  live status ticker (reference progress.go analog)
    cli.py       spark-submit entry point
"""

__version__ = "0.2.0"
