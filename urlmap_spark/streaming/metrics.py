"""Event-time windowed crawl metrics — the watermark + tumbling-window
surface of Structured Streaming.

The batch crawl folds per-round metrics driver-side (plans/crawl.py
round loop; reference: internal/progress/progress.go keeps running
counters). A CONTINUOUS crawl needs the same numbers over EVENT TIME
with late data handled: fetch events arrive out of order from many
executors, and per-window state must be bounded. `withWatermark`
bounds it — windows older than (max event time - watermark) finalize,
emit once in append mode, and their state is dropped; later-arriving
rows for a finalized window are discarded instead of growing state
forever (the 10^10-event requirement).

The same function runs on a plain batch frame (the unified Dataset
API; withWatermark is a no-op in batch), which is how the DuckDB
oracle twin (`stream-window-metrics`, time_bucket) value-checks the
aggregation itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_host_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "host",
    window_dur: str = "1 hour",
    watermark: str = "1 hour",
    ok_expr: Column | None = None,
) -> DataFrame:
    """(window_start, window_end, <key>, fetches[, crawled]) per
    event-time tumbling window per key.

    Streaming input: append-mode-ready (watermarked) windowed agg —
    partial aggregation is map-side, state keyed by (window, key),
    bounded by the watermark. Batch input: the identical plan minus
    state (a plain hash aggregate).
    """
    e = events.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("fetches")]
    if ok_expr is not None:
        aggs.append(F.sum(F.when(ok_expr, 1).otherwise(0)).alias("crawled"))
    return (
        e.groupBy(F.window(ts_col, window_dur).alias("w"), key_col)
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                key_col,
                "fetches", *(["crawled"] if ok_expr is not None else []))
    )
