"""Hashed-feature linear classifier (operators/classify.py).

The margin must be an exact, order-independent sum (dyadic weights),
the trained-weights path must index correctly, and the curate_corpus
'classifier' rule must slot after 'quality' in the fixed order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from urlmap_spark.operators.classify import (
    classifier_score,
    dyadic_weight_expr,
    feature_index_expr,
    hashed_margin_expr,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trained_weights_path(spark):
    """With hash = token length the feature indices are transparent:
    'a bb ccc' -> slots 1,2,3 -> weights[1]+weights[2]+weights[3]."""
    df = _docs(spark, [(0, "a bb ccc"), (1, "a a a")])
    out = classifier_score(
        df, weights=[10.0, 1.0, 0.1, 0.01], hash_expr=F.length, bias=0.5,
    )
    got = {r["doc_id"]: (r["clf_margin"], r["clf_score"]) for r in out.collect()}
    assert got[0][0] == 0.5 + 1.0 + 0.1 + 0.01
    assert got[1][0] == 0.5 + 3 * 1.0  # repeated token sums three times
    import math

    for m, s in got.values():
        assert abs(s - 1.0 / (1.0 + math.exp(-m))) < 1e-12


def test_null_and_empty_text_score_bias(spark):
    df = _docs(spark, [(0, None), (1, ""), (2, "   ")])
    out = classifier_score(df, dim=64, bias=-1.5)
    assert {r["clf_margin"] for r in out.collect()} == {-1.5}


def test_dyadic_margins_are_exact_multiples(spark):
    """Every dyadic pseudo-weight is k/1024, so margin*1024 must be an
    exact integer — the property that makes the oracle tolerance-free."""
    df = _docs(spark, [(i, f"tok{i} alpha beta gamma delta x{i * 7}")
                       for i in range(50)])
    for r in classifier_score(df, dim=4096).collect():
        v = r["clf_margin"] * 1024
        assert v == int(v)


def test_margin_partitioning_invariant(spark):
    rows = [(i, f"word{i % 13} and some shared tokens {i % 7}") for i in range(200)]
    df = _docs(spark, rows)
    a = {r["doc_id"]: r["clf_margin"]
         for r in classifier_score(df.repartition(1), dim=512).collect()}
    b = {r["doc_id"]: r["clf_margin"]
         for r in classifier_score(df.repartition(17), dim=512).collect()}
    assert a == b


def test_feature_index_nonnegative(spark):
    """xxhash64 is signed; pmod must land every index in [0, dim)."""
    df = _docs(spark, [(i, "") for i in range(300)])
    idx = df.select(
        feature_index_expr(F.concat(F.lit("t"), F.col("doc_id")), 32).alias("i"))
    vals = [r["i"] for r in idx.collect()]
    assert min(vals) >= 0 and max(vals) < 32


def test_dyadic_weight_range(spark):
    df = spark.range(2049).select(dyadic_weight_expr(F.col("id")).alias("w"))
    ws = [r["w"] for r in df.collect()]
    assert min(ws) >= -1.0 and max(ws) <= 1.0
    assert len(set(ws)) > 1000  # the slot->weight map actually spreads


def test_curate_classifier_rule_order(spark):
    """'classifier' fires only after lang/length/quality pass, and only
    when enabled; default-off adds no columns."""
    from urlmap_spark.plans.curate import curate_corpus

    good = "the quick brown fox jumps over the lazy dog and keeps on running fine"
    rows = [
        (0, good),                       # passes everything
        (1, "zzz qqq xxx"),              # fails an earlier rule (lang)
        (2, good + " extra tail words here to change its hash profile a lot"),
    ]
    docs = _docs(spark, rows)
    # weights chosen via length-hash so doc 0/2 margins differ: slot =
    # len(token); min_clf_score between their sigmoids isolates the rule
    out = curate_corpus(
        docs, pairs=None, allowed_langs=("en",), min_tokens=5,
        min_quality=0.0, min_clf_score=0.99, clf_weights=[0.0] * 10,
        clf_bias=-10.0,
    )
    got = {r["doc_id"]: r["drop_reason"] for r in out.collect()}
    # bias -10 -> score ~0 for every doc that survives earlier rules
    assert got[1] == "lang"  # earlier rule wins over classifier
    assert got[0] == "classifier" and got[2] == "classifier"
    assert "clf_score" in out.columns and "clf_margin" in out.columns

    off = curate_corpus(docs, pairs=None, allowed_langs=("en",))
    assert "clf_score" not in off.columns


def test_table_path_matches_literal_path_exactly(spark):
    """classifier_score_table with dyadic_weights_df must equal
    classifier_score's aggregate-literal margins bit-for-bit — same
    hash, same weights, different physical plan."""
    from urlmap_spark.operators.classify import (
        classifier_score_table,
        dyadic_weights_df,
    )
    from urlmap_spark.operators.packing import arith_mix_expr

    rows = [(i, f"word{i % 13} and some shared tokens {i % 7}") for i in range(200)]
    rows += [(200, None), (201, ""), (202, "   ")]
    df = _docs(spark, rows)
    lit = {r["doc_id"]: r["clf_margin"]
           for r in classifier_score(
               df, dim=4096, hash_expr=arith_mix_expr, bias=0.25).collect()}
    tab = {r["doc_id"]: r["clf_margin"]
           for r in classifier_score_table(
               df, dyadic_weights_df(spark, 4096), dim=4096,
               hash_expr=arith_mix_expr, bias=0.25).collect()}
    assert lit == tab  # exact equality: dyadic sums are order-independent


def test_table_path_sparse_weights_score_zero(spark):
    """Slots absent from the weights table contribute 0 — a sparse
    trained vector stores only non-zero entries."""
    from urlmap_spark.operators.classify import classifier_score_table

    w = spark.createDataFrame([(1, 10.0), (3, 0.5)], "slot int, weight double")
    df = _docs(spark, [(0, "a bb ccc dddd")])  # slots 1,2,3,4 via length
    got = classifier_score_table(
        df, w, dim=32, hash_expr=F.length).collect()[0]
    assert got["clf_margin"] == 10.0 + 0.5  # slots 2,4 missing -> 0


def test_table_path_plan_shape(spark):
    """The weight lookup must be a broadcast hash join and the whole
    plan Python-free — the classifier adds no corpus-side exchange
    beyond the (id, slot) feature stream."""
    from urlmap_spark.operators.classify import (
        classifier_score_table,
        dyadic_weights_df,
    )

    df = _docs(spark, [(i, "alpha beta") for i in range(50)])
    out = classifier_score_table(df, dyadic_weights_df(spark, 256), dim=256)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_table_path_at_2_20_slots(spark):
    """VERDICT r4 #8: the production weights-table path at dim 2^20
    (the regime the array-literal path cannot reach). Synthetic dyadic
    weights; margins value-checked against a driver-side recomputation
    over the Spark-derived slots, and the BroadcastExchange's measured
    dataSize recorded (the doc's 2^20 broadcast-size number)."""
    from urlmap_spark.operators.classify import (
        classifier_score_table,
        dyadic_weights_df,
    )
    from urlmap_spark.operators.packing import arith_mix_expr

    DIM = 1 << 20
    rows = [(i, f"tok{i % 997} alpha{i % 131} beta{i} gamma shared words "
                f"x{i*7 % 503}") for i in range(300)]
    rows += [(300, None), (301, "")]
    df = _docs(spark, rows)
    w = dyadic_weights_df(spark, DIM)
    out = classifier_score_table(df, w, dim=DIM, hash_expr=arith_mix_expr,
                                 bias=0.5)
    got = {r["doc_id"]: r["clf_margin"] for r in out.collect()}

    # driver-side recomputation: slots from the SAME Spark expression,
    # weights from the dyadic formula — exact dyadic sums, so equality
    # is bit-for-bit
    from urlmap_spark.functions.textstats import tokens_expr
    from urlmap_spark.operators.classify import (
        _DYW_A, _DYW_B, _DYW_HALF, _DYW_MOD, feature_index_expr)

    slot_rows = df.select(
        "doc_id",
        F.explode_outer(tokens_expr(F.lower(F.coalesce(F.col("text"),
                                                       F.lit(""))))).alias("t")
    ).select(
        "doc_id", feature_index_expr(F.col("t"), DIM, arith_mix_expr)
        .alias("slot")).collect()
    import collections
    exp = collections.defaultdict(lambda: 0.5)
    for r in slot_rows:
        if r["slot"] is None:
            exp[r["doc_id"]] += 0.0
            continue
        s = int(r["slot"])
        exp[r["doc_id"]] += ((s * _DYW_A + _DYW_B) % _DYW_MOD - _DYW_HALF) / _DYW_HALF
    assert got == dict(exp)

    # measured broadcast size of the 2^20-slot weight table
    ep = out._jdf.queryExecution().executedPlan()
    sizes = []

    def walk(node):
        nm = node.nodeName()
        if "BroadcastExchange" in nm:
            m = node.metrics()
            if m.contains("dataSize"):
                sizes.append(m.apply("dataSize").value())
        if "QueryStage" in nm:  # AQE wraps materialized stages
            walk(node.plan())
        if nm.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(ep)
    assert sizes, "no BroadcastExchange found in executed plan"
    mib = max(sizes) / (1 << 20)
    print(f"\n2^20-slot weights BroadcastExchange dataSize = {mib:.1f} MiB")
    assert 8 <= mib <= 128  # sane: 2^20 (int,double) rows, hashed relation
