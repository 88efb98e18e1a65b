"""Decontamination (operators/decontam.py) + repetition stats and PII
scrubbing (functions/textstats.py): handcrafted inputs with hand-derived
expected values, plus a brute-force python cross-check for the
contamination join."""

from __future__ import annotations

from pyspark.sql import functions as F

from urlmap_spark.functions.textstats import (
    dup_token_frac_expr,
    pii_count_expr,
    pii_scrub_expr,
    top_ngram_frac_expr,
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
)
from urlmap_spark.operators.decontam import contamination


def _stats(spark, text, n=2):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        dup_token_frac_expr(F.col("text")).alias("d"),
        top_ngram_frac_expr(F.col("text"), n).alias("t"),
    ).collect()[0]
    return row["d"], row["t"]


def test_repetition_handcrafted(spark):
    # "a a a a": 4 tokens 1 distinct -> dup 0.75; bigrams [a a, a a, a a]
    # -> top bigram 3/3 = 1.0
    d, t = _stats(spark, "a a a a")
    assert d == 0.75 and t == 1.0
    # all-distinct text: dup 0.0; every bigram unique -> 1/4
    d, t = _stats(spark, "one two three four five")
    assert d == 0.0 and t == 0.25
    # case folding: "The the" are the same token
    d, _ = _stats(spark, "The the")
    assert d == 0.5


def test_repetition_short_and_empty(spark):
    # single token: no real bigram -> clamps to one whole-text gram
    d, t = _stats(spark, "hello")
    assert d == 0.0 and t == 1.0
    d, t = _stats(spark, "")
    assert d == 0.0 and t == 1.0


def test_pii_scrub_and_counts(spark):
    text = ("write to alice.smith+x@corp.example.org or bob@x.io, "
            "server 192.168.0.1 and 10.0.3.7, call +1-555-0100-1234 today")
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        pii_count_expr(F.col("text"), PII_EMAIL_RE).alias("e"),
        pii_count_expr(F.col("text"), PII_IPV4_RE).alias("i"),
        pii_count_expr(F.col("text"), PII_PHONE_RE).alias("p"),
        pii_scrub_expr(F.col("text")).alias("s"),
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (2, 2, 1)
    assert row["s"] == ("write to <EMAIL> or <EMAIL>, "
                        "server <IP> and <IP>, call <PHONE> today")


def test_pii_no_match_is_identity(spark):
    text = "no personal data here just words and 12 numbers"
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(pii_scrub_expr(F.col("text")).alias("s")).collect()[0]
    assert row["s"] == text


def _brute_contaminated(docs, evals, n, min_shared):
    def grams(text):
        toks = [t for t in text.lower().split() if t]
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    ev = set().union(*(grams(e) for e in evals)) if evals else set()
    return {i: len(grams(t) & ev) for i, t in docs}


def test_contamination_vs_brute_force(spark):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated words about spark shuffles and joins"),
        (2, "quick brown fox jumps over the lazy dog"),  # shares eval grams
        (3, "tiny"),
    ]
    evals = ["brown fox jumps over the lazy", "tiny"]
    got = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in contamination(
            spark.createDataFrame(docs, "doc_id long, text string"),
            spark.createDataFrame([(e,) for e in evals], "text string"),
            n=3, min_shared=2,
        ).collect()
    }
    want = _brute_contaminated(docs, evals, 3, 2)
    assert set(got) == set(want)
    for i, ns in want.items():
        assert got[i] == (ns, ns >= 2), (i, got[i], ns)
    # doc 1 shares nothing; doc 3 ("tiny") shares ONE whole-text gram
    # -> below min_shared
    assert got[1] == (0, False) and got[3] == (1, False)
    assert got[0][1] and got[2][1]


def test_contamination_broadcasts_eval_side(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string")
    evals = spark.createDataFrame([("w10 w11 w12 w13",)], "text string")
    out = contamination(docs, evals, n=3, min_shared=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # doc i's 3-grams are (i,i+1,i+2) and (i+1,i+2,i+3); the eval row
    # contributes (10,11,12) and (11,12,13) -> docs 9, 10, 11 overlap
    flagged = {r["doc_id"] for r in out.filter("contaminated").collect()}
    assert flagged == {9, 10, 11}
