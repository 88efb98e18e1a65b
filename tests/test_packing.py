"""Shard packing + deterministic sampling (operators/packing.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from urlmap_spark.operators.packing import (
    arith_mix_expr,
    hash_sample,
    pack_shards,
    stratified_sample,
    with_running_total,
)


def _docs(spark, toks):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long")


def test_running_total_exclusive_and_partition_invariant(spark):
    toks = [5, 1, 7, 3, 2, 9, 4]
    expect = {}
    acc = 0
    for i, t in enumerate(toks):
        expect[i] = acc
        acc += t
    for parts in (1, 3, 16):
        df = _docs(spark, toks).repartition(parts)
        out = with_running_total(df, ["doc_id"], "n_tokens")
        got = {r["doc_id"]: r["cum_before"] for r in out.collect()}
        assert got == expect, parts


def test_pack_shards_budget_semantics(spark):
    # budget 10: cum_before 0,5,6,13,16,18,27 -> shards 0,0,0,1,1,1,2
    toks = [5, 1, 7, 3, 2, 9, 4]
    out = pack_shards(_docs(spark, toks), budget=10)
    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 2}
    # every shard's token sum straddles the budget by < its last doc
    sums = {}
    for i, t in enumerate(toks):
        sums[got[i]] = sums.get(got[i], 0) + t
    assert sums == {0: 13, 1: 14, 2: 4}


def test_pack_shards_null_tokens_count_zero(spark):
    """Null token counts pack as 0-size documents instead of poisoning
    the prefix sum (sum() over an all-null range partition is null, and
    null cum_before would null every later shard id)."""
    rows = [(0, 5), (1, None), (2, 7), (3, None), (4, 9)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_shards(df, budget=10)
    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    # cum_before: 0, 5, 5, 12, 12 -> shards 0, 0, 0, 1, 1
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_pack_shards_empty(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_shards(df, budget=10).collect() == []


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow], derandomize=True)
@given(toks=st.lists(st.integers(0, 50), min_size=1, max_size=40),
       budget=st.integers(1, 60), parts=st.integers(1, 5))
def test_pack_shards_fuzz_vs_sequential(spark, toks, budget, parts):
    out = pack_shards(_docs(spark, toks).repartition(parts), budget=budget)
    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    acc = 0
    for i, t in enumerate(toks):
        assert got[i] == acc // budget, (i, toks, budget)
        acc += t


def test_hash_sample_deterministic_and_monotone(spark):
    docs = _docs(spark, [1] * 400)
    kept = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    kept2 = {r["doc_id"] for r in hash_sample(docs.repartition(13), 0.3).collect()}
    assert kept == kept2  # partitioning-invariant
    assert 0.15 < len(kept) / 400 < 0.45  # rough rate
    # raising the rate only ADDS rows (slot < floor(rate*1e6) is monotone)
    more = {r["doc_id"] for r in hash_sample(docs, 0.6).collect()}
    assert kept <= more
    # rate 0 / 1 edge cases
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 400


def test_stratified_sample_rates_and_default(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(docs, {"en": 1.0, "de": 0.5}, strata_col="lang")
    by_lang = {r["lang"]: r["count"]
               for r in out.groupBy("lang").count().collect()}
    assert by_lang.get("en") == 100        # rate 1.0 keeps all
    assert "zh" not in by_lang             # default_rate 0 drops stratum
    assert 20 < by_lang.get("de", 0) < 80  # ~50%
    # arith_mix family (what the DuckDB oracle recomputes) must be a
    # real sampler too: rate-1.0 stratum intact, 0.5 stratum ~half.
    # (The UNMIXED polynomial hash fails this: consecutive ids cluster
    # in narrow slot bands — that's why arith_mix_expr exists.)
    out2 = stratified_sample(docs, {"en": 1.0, "de": 0.5}, strata_col="lang",
                             hash_expr=arith_mix_expr)
    by2 = {r["lang"]: r["count"] for r in out2.groupBy("lang").count().collect()}
    assert by2.get("en") == 100
    assert 20 < by2.get("de", 0) < 80


def test_hash_sample_string_key(spark):
    docs = spark.createDataFrame(
        [(f"u{i}", i) for i in range(50)], "uid string, v long")
    kept = hash_sample(docs, 0.5, key_col="uid")
    assert 5 < kept.count() < 45
