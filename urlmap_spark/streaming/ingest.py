"""Streaming ingestion: continuous URL discovery feeding the seen set.

The reference is a TERMINATING BFS, so the crawl itself is batch-
iterative by design (SURVEY.md §4.4) — but a production frontier is fed
by continuous discovery (sitemap drops, log-derived URLs, corpus
snapshots landing in object storage). This module is that edge:

    readStream(new corpus/url files) --foreachBatch-->
        exact-dedup against the persisted seen table -->
        append fresh URLs (the next crawl's extra seeds)

foreachBatch keeps each micro-batch transactional against the same
parquet layout the batch crawl checkpoints use, so a periodic batch
crawl and a continuous discoverer share one URL-seen state. Watermarks/
stateful operators are unnecessary — URL identity is exact dedup, which
the seen table already is.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingSeenIngest:
    """Continuously fold discovered URLs into a parquet seen-set.

    state_dir/seen/   — accumulated unique urls (url string)
    state_dir/_ckpt/  — the streaming engine's checkpoint (exactly-once
                        per micro-batch via foreachBatch + append)
    """

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.seen_path = os.path.join(state_dir, "seen")
        os.makedirs(self.seen_path, exist_ok=True)

    def _seen(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.seen_path)
        except Exception:  # no committed files yet
            return None

    def _fold_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..functions.urlkernel import is_valid_udf, normalize_udf

        fresh = (
            batch.select(normalize_udf(F.trim(F.col("url"))).alias("url"),
                         is_valid_udf(F.trim(F.col("url"))).alias("_v"))
            .filter(F.col("_v") & F.col("url").isNotNull())
            .select("url").dropDuplicates(["url"])
        )
        seen = self._seen()
        if seen is not None:
            fresh = fresh.join(seen, "url", "left_anti")
        fresh.write.mode("append").parquet(self.seen_path)

    def run_available_now(self, input_path: str, url_col: str = "url") -> None:
        """Process everything currently in input_path and stop — the
        incremental-batch trigger (a long-lived deployment would use
        processingTime instead)."""
        stream = (
            self.spark.readStream.schema(f"{url_col} string")
            .parquet(input_path)
            .withColumnRenamed(url_col, "url")
        )
        q = (
            stream.writeStream
            .foreachBatch(self._fold_batch)
            .option("checkpointLocation", os.path.join(self.state_dir, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def seen_count(self) -> int:
        s = self._seen()
        return 0 if s is None else s.count()
