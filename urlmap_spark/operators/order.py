"""Scalable global ordering — dense rank without a single-task sort.

The crawl needs a total crawl-order over each round's newly discovered
URLs (reference: FIFO enqueue order, internal/crawler/crawler.go:252).
A plain ``row_number().over(Window.orderBy(...))`` funnels the whole
round through ONE task; at 10^10-frontier scale that is the bottleneck.

``with_global_order`` uses the classic two-pass pattern, with one twist
that makes it DETERMINISTIC at scale:
  1. range-repartition + sort-within-partitions on the order keys and
     collect, per partition, its row count AND its max key (tiny driver
     collect, two scalars per task);
  2. re-bucket rows with a PURE ROW FUNCTION — bucket(k) = number of
     pass-1 partition-max boundaries lexicographically below k — then
     per-bucket row_number + broadcast cumulative offsets.

The twist matters: pass 1's RangePartitioner SAMPLES its boundaries,
and a second ``repartitionByRange`` execution re-samples them — two
executions of the "same" range shuffle can place a boundary a few rows
apart once partitions hold more rows than the sampler reads (observed
at the 10^7-URL operating point as rank shifts between identical
crawls; invisible at test scale where the sampler sees every row).
Deriving pass 2's bucketing from pass 1's own measured boundaries
removes the cross-execution dependency: rows in pass-1 partition i are
exactly the keys in (max_{i-1}, max_i], so bucket(k) reproduces the
pass-1 assignment bit-for-bit, the offsets line up by construction,
and the emitted rank is the exact global sort rank — independent of
where the sampled boundaries fell, the input layout, or the
parallelism. (Bonus: pass 2 is a plain hash shuffle on the bucket id —
no second sampling job.)

Total cost: one range shuffle + one hash shuffle, no global funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lex_gt(keys: list, vals: tuple):
    """Column predicate: (k0, k1, ...) lexicographically > vals."""
    c0, v0 = keys[0], F.lit(vals[0])
    if len(keys) == 1:
        return c0 > v0
    return (c0 > v0) | ((c0 == v0) & _lex_gt(keys[1:], vals[1:]))


def with_global_order(
    df: DataFrame,
    sort_cols: list[str],
    order_col: str = "order",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``order_col`` = start, start+1, ... following sort_cols order.

    Sort keys must be distinct per row (ties spanning a pass-1 boundary
    would otherwise make bucket assignment ambiguous) and NON-NULL: the
    bucket expression compares keys lexicographically, so a NULL key
    would null-propagate into a silent NULL order — instead, a runtime
    guard raises on the first null-keyed row when the order column
    materializes (ADVICE r4). The crawl guarantees both because
    (parent_order, pos) identifies one href slot.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in sort_cols]
    ranged = df.repartitionByRange(num_partitions, *keys).sortWithinPartitions(*keys)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # Pass 1: per-partition count + max key (two scalars per partition)
    stats = sorted(
        with_pid.groupBy("_pid").agg(
            F.count("*").alias("cnt"),
            F.max(F.struct(*keys)).alias("mx")).collect(),
        key=lambda r: r["_pid"],
    )
    if not stats:  # empty round — nothing to order
        return df.withColumn(order_col, F.lit(None).cast("long")), start
    offsets, acc = [], start
    for r in stats:
        offsets.append(acc)
        acc += r["cnt"]
    # Pass 2: deterministic re-bucketing by pass 1's own boundaries.
    # bucket(k) = #(partition-max boundaries < k); for a row of pass-1
    # partition i that is exactly i, so offsets align bit-for-bit.
    bucket = F.lit(0)
    for r in stats[:-1]:
        bucket = bucket + _lex_gt(keys, tuple(r["mx"])).cast("int")
    # contract guard: a NULL sort key would null-propagate through
    # _lex_gt into a silent NULL bucket/order — raise loudly instead
    allnn = F.lit(True)
    for k in keys:
        allnn = allnn & k.isNotNull()
    bucket = F.when(allnn, bucket).otherwise(F.raise_error(F.lit(
        "with_global_order: NULL sort key "
        f"(sort_cols={sort_cols!r} must be non-null)")))
    w = Window.partitionBy("_bkt").orderBy(*keys)
    offmap = F.create_map(
        *[x for i, off in enumerate(offsets) for x in (F.lit(i), F.lit(off))])
    return (
        df.withColumn("_bkt", bucket)
        .withColumn(order_col,
                    (F.row_number().over(w) - 1 + offmap[F.col("_bkt")]).cast("long"))
        .drop("_bkt")
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
