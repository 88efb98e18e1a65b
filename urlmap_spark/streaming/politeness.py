"""Streaming politeness: a CUSTOM STATEFUL operator over a fetch-event
stream (applyInPandasWithState).

The batch crawl enforces per-host quotas with a two-phase top-k per
round (operators/politeness.py). A continuous fetch pipeline needs the
same policy over an unbounded stream, where "this round" is replaced by
a rolling event-time window and the used-up budget must SURVIVE across
micro-batches — exactly the shape Structured Streaming's
applyInPandasWithState exists for: per-key (host) state, arbitrary
user logic, Arrow-batched.

State per host: (window_start, used). A row is allowed while `used` <
quota within its window; the window rolls forward when an event's ts
crosses window_start + window_ms (mirroring the batch semantics where
each round resets the budget). Rows keep arriving in ts order within a
host because the file source preserves file order per batch and the
operator sorts each group's batch — cross-batch ordering is the
caller's contract (a production deployment keys files by time, like
the fixtures the test writes).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DECISION_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("allowed", T.BooleanType()),
    T.StructField("used", T.IntegerType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("window_start", T.LongType()),
    T.StructField("used", T.IntegerType()),
])


def host_quota_decisions(fetches: DataFrame, quota: int,
                         window_ms: int = 1000) -> DataFrame:
    """fetches(host, url, ts) [streaming] -> (host, url, ts, allowed,
    used): at most `quota` allowed rows per host per window_ms of event
    time; the budget persists across micro-batches in group state."""

    def decide(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            window_start, used = state.get
        else:
            window_start, used = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            out = []
            for r in pdf.itertuples():
                ts = int(r.ts)
                if window_start is None or ts >= window_start + window_ms:
                    window_start = ts - (ts % window_ms)
                    used = 0
                allowed = used < quota
                if allowed:
                    used += 1
                out.append((host, r.url, ts, allowed, used))
            yield pd.DataFrame(out, columns=[f.name for f in DECISION_SCHEMA.fields])
        state.update((window_start, used))

    # a null event time cannot be windowed or ordered: drop the row up
    # front (JVM-side filter) instead of letting int(None) abort the
    # whole streaming query inside the state function
    return (
        fetches.filter(F.col("ts").isNotNull())
        .groupBy("host")
        .applyInPandasWithState(
            decide, DECISION_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout)
    )
