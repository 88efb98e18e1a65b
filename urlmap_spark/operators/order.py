"""Scalable global ordering — dense rank without a single-task sort.

The crawl needs a total crawl-order over each round's newly discovered
URLs (reference: FIFO enqueue order, internal/crawler/crawler.go:252).
A plain ``row_number().over(Window.orderBy(...))`` funnels the whole
round through ONE task; at 10^10-frontier scale that is the bottleneck.

``with_global_order`` instead uses the classic two-pass pattern:
  1. range-repartition + sort-within-partitions on the order keys
     (range partitions are disjoint and pid-ordered),
  2. count rows per partition (tiny driver collect, one int per task),
  3. per-partition row_number + broadcast cumulative offsets.
Total cost: one range shuffle, no global funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_order(
    df: DataFrame,
    sort_cols: list[str],
    order_col: str = "order",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``order_col`` = start, start+1, ... following sort_cols order.

    Sort keys must be distinct per row (ties across range-partition
    boundaries would otherwise make ranks partition-dependent); the crawl
    guarantees this because (parent_order, pos) identifies one href slot.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in sort_cols]
    ranged = df.repartitionByRange(num_partitions, *keys).sortWithinPartitions(*keys)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # Pass 1: per-partition counts (one row per partition -> driver)
    counts = {r["_pid"]: r["cnt"] for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    if not counts:  # empty round — nothing to order
        return df.withColumn(order_col, F.lit(None).cast("long")), start
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offmap = F.create_map(*[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))])
    # Pass 2: local rank + offset. The window is per-partition (_pid), so no
    # cross-partition shuffle happens here.
    w = Window.partitionBy("_pid").orderBy(*keys)
    return (
        with_pid
        .withColumn(order_col, (F.row_number().over(w) - 1 + offmap[F.col("_pid")]).cast("long"))
        .drop("_pid")
    ), acc


def first_wins(df: DataFrame, key: str, tie_cols: list[str]) -> DataFrame:
    """Keep, per key, the row with the lexicographically smallest tie_cols
    (first-discoverer-wins dedup, reference: internal/crawler/crawler.go:253
    sequential / :754 LoadOrStore concurrent). A hash-aggregate, not a
    window: Spark does partial (map-side) min before the shuffle."""
    others = [c for c in df.columns if c != key]
    packed = df.select(key, F.struct(*[F.col(c) for c in tie_cols],
                                     *[F.col(c) for c in others if c not in tie_cols]).alias("_s"))
    return (
        packed.groupBy(key).agg(F.min("_s").alias("_s")).select(key, "_s.*")
    )
