"""Global-ordering and dedup primitives (operators/order.py)."""

import random

from pyspark.sql import functions as F

from urlmap_spark.operators.order import first_wins, with_global_order


def test_with_global_order_dense_and_correct(spark):
    rows = [(f"u{i}", i * 7 % 101, i % 13) for i in range(101)]
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, "url string, a int, b int").repartition(16)
    out, nxt = with_global_order(df, ["a", "b"], order_col="order", start=1000)
    got = [(r["a"], r["b"], r["order"]) for r in out.collect()]
    got.sort(key=lambda t: t[2])
    assert nxt == 1000 + 101
    assert [g[2] for g in got] == list(range(1000, 1101))  # dense, offset
    assert [(g[0], g[1]) for g in got] == sorted((a, b) for _, a, b in
                                                 [(u, a, b) for u, a, b in rows])


def test_with_global_order_empty(spark):
    df = spark.createDataFrame([], "url string, a int, b int")
    out, nxt = with_global_order(df, ["a", "b"], start=5)
    assert nxt == 5 and out.count() == 0


def test_first_wins_keeps_min_tie_and_payload(spark):
    rows = [
        ("u1", 5, 2, 10), ("u1", 3, 9, 11), ("u1", 3, 1, 12),
        ("u2", 7, 0, 13),
    ]
    df = spark.createDataFrame(rows, "url string, parent_order long, pos int, depth int")
    out = {r["url"]: (r["parent_order"], r["pos"], r["depth"])
           for r in first_wins(df, "url", ["parent_order", "pos"]).collect()}
    assert out == {"u1": (3, 1, 12), "u2": (7, 0, 13)}
