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

    state_dir/seen/bucket=N/ — accumulated unique urls, HASH-BUCKETED on
                        disk (partitionBy): each micro-batch's anti-join
                        reads only the buckets its own URLs hash to
                        (partition pruning), so the per-batch scan is
                        proportional to the batch's bucket fan-out, not
                        to the full history — the same bucketed layout
                        the batch crawl's seen deltas use
    state_dir/_ckpt/  — the streaming engine's checkpoint (exactly-once
                        per micro-batch via foreachBatch + append)
    """

    def __init__(self, spark: SparkSession, state_dir: str, n_buckets: int = 64):
        self.spark = spark
        self.state_dir = state_dir
        self.n_buckets = n_buckets
        self.seen_path = os.path.join(state_dir, "seen")
        os.makedirs(self.seen_path, exist_ok=True)
        self._migrate_legacy_layout()

    def _migrate_legacy_layout(self) -> None:
        """Earlier versions wrote seen/ as FLAT parquet files (no bucket
        partition column). Resuming such a state_dir with the bucketed
        layout would break partition discovery (mixed flat files +
        bucket=N/ dirs), so on init any flat row files are rewritten once
        into the bucketed layout and removed."""
        legacy = [
            os.path.join(self.seen_path, f)
            for f in os.listdir(self.seen_path)
            if os.path.isfile(os.path.join(self.seen_path, f))
            and not f.startswith((".", "_"))
        ]
        if not legacy:
            return
        old = self.spark.read.parquet(*legacy).select("url").dropDuplicates(["url"])
        # crash-safety: a previous migration may have died between the
        # bucketed append and the flat-file removal — anti-join against
        # rows already in bucket dirs so re-running never duplicates
        try:
            bucketed = self.spark.read.parquet(
                *[os.path.join(self.seen_path, d)
                  for d in os.listdir(self.seen_path)
                  if d.startswith("bucket=")])
            old = old.join(bucketed.select("url"), "url", "left_anti")
        except Exception:  # no bucket dirs yet
            pass
        # localCheckpoint: fully materialize BEFORE touching the files the
        # plan reads from (the append below must not scan its own output)
        old = old.localCheckpoint(eager=True)
        if old.count() > 0:
            self._bucketed(old).write.mode("append") \
                .partitionBy("bucket").parquet(self.seen_path)
        for p in legacy:
            os.remove(p)

    def _seen(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.seen_path)
        except Exception:  # no committed files yet
            return None

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(self.n_buckets)).cast("int"))

    def pruned_seen_for(self, batch: DataFrame) -> DataFrame | None:
        """The slice of the seen set a batch's anti-join actually needs:
        seen rows in the batch's buckets only. The isin filter on the
        partition column prunes bucket directories at scan time."""
        seen = self._seen()
        if seen is None:
            return None
        bks = [r["bucket"] for r in
               self._bucketed(batch.select("url")).select("bucket").distinct().collect()]
        return seen.filter(F.col("bucket").isin(bks))

    def _fold_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..functions.urlkernel import is_valid_udf, normalize_udf

        fresh = (
            batch.select(normalize_udf(F.trim(F.col("url"))).alias("url"),
                         is_valid_udf(F.trim(F.col("url"))).alias("_v"))
            .filter(F.col("_v") & F.col("url").isNotNull())
            .select("url").dropDuplicates(["url"])
        )
        pruned = self.pruned_seen_for(fresh)
        if pruned is not None:
            fresh = fresh.join(pruned.select("url"), "url", "left_anti")
        self._bucketed(fresh).write.mode("append") \
            .partitionBy("bucket").parquet(self.seen_path)

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
