"""Corpus-curation plan (plans/curate.py): rule precedence, per-rule
verdicts, dedup composition, and the no-pairs singleton path."""

from __future__ import annotations

from pyspark.sql import functions as F

from urlmap_spark.plans.curate import curate_corpus

# crafted docs: each exercises one rule (quality scores verified
# against the oracle-checked quality_score_expr semantics)
GOOD = "the cat and the dog walk to the park and sit on a bench in the sun"
DOCS = [
    (0, GOOD),                                   # keeps
    (1, GOOD + " extra"),                        # near-dup of 0 (lower id wins ties below)
    (2, "el perro la casa los gatos que una"),   # es -> lang rule when only en allowed
    (3, "the cat"),                              # 2 tokens -> length
    (4, "the !!! ??? ,,, ;;; of ::: !!!"),       # punctuation soup -> quality
]


def _curate(spark, allowed=("en",), pairs=None, **kw):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = curate_corpus(docs, pairs=pairs, allowed_langs=allowed,
                        min_tokens=5, min_quality=0.5, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_rules_and_reasons_no_pairs(spark):
    got = _curate(spark)
    assert got[0]["keep"] and got[0]["drop_reason"] is None
    assert got[2]["drop_reason"] == "lang" and not got[2]["keep"]
    assert got[3]["drop_reason"] == "length"
    assert got[4]["drop_reason"] == "quality"
    # no pairs -> everyone their own keeper
    assert all(v["keeper_id"] == k and not v["is_duplicate"]
               for k, v in got.items())
    assert got[2]["lang_pred"] == "es" and got[0]["lang_pred"] == "en"


def test_dedup_verdict_and_precedence(spark):
    spark_pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    got = _curate(spark, pairs=spark_pairs)
    # doc 1 is longer -> higher length-score -> higher quality -> keeper
    assert got[1]["keep"] and got[1]["drop_reason"] is None
    assert got[0]["drop_reason"] == "duplicate" and got[0]["keeper_id"] == 1
    assert got[0]["component"] == 0 and got[1]["component"] == 0
    # earlier rules outrank 'duplicate': make doc 2 a dup of 0 too —
    # its reason must stay 'lang'
    tri = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    got2 = _curate(spark, pairs=tri)
    assert got2[2]["drop_reason"] == "lang"
    assert got2[2]["is_duplicate"]  # verdict columns still populated


def test_passthrough_and_filter_shape(spark):
    docs = spark.createDataFrame(
        [(i, GOOD, f"src{i}") for i in range(3)],
        "doc_id long, text string, source string")
    out = curate_corpus(docs, allowed_langs=("en",))
    assert {f.name for f in out.schema.fields} >= {
        "doc_id", "text", "source", "lang_pred", "n_tokens", "quality",
        "component", "keeper_id", "is_duplicate", "drop_reason", "keep"}
    kept = out.filter(F.col("keep")).select("doc_id", "source").collect()
    assert sorted((r["doc_id"], r["source"]) for r in kept) == [
        (0, "src0"), (1, "src1"), (2, "src2")]


def test_token_bounds_max(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["the"] * 50))], "doc_id long, text string")
    out = curate_corpus(docs, allowed_langs=("en",), max_tokens=10)
    row = out.collect()[0]
    assert row["drop_reason"] == "length" and row["n_tokens"] == 50


def test_repetition_rule_optional(spark):
    # GOOD has many repeats of 'the' (dup_token_frac ~0.47); a tight
    # cap drops it as 'repetition', and the rule outranks 'duplicate'
    docs = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    row = curate_corpus(docs, allowed_langs=("en",),
                        max_dup_token_frac=0.2).collect()[0]
    assert row["drop_reason"] == "repetition" and row["dup_token_frac"] > 0.2
    # default (None) leaves the column out and the doc kept
    row = curate_corpus(docs, allowed_langs=("en",)).collect()[0]
    assert row["keep"] and "dup_token_frac" not in row.asDict()


def test_decontam_rule_optional(spark):
    leaky = "the cat and purple rivers flow beneath seven bridges at dawn"
    docs = spark.createDataFrame(
        [(0, GOOD), (1, leaky)], "doc_id long, text string")
    evals = spark.createDataFrame(
        [("purple rivers flow beneath seven bridges",)], "text string")
    got = {r["doc_id"]: r.asDict()
           for r in curate_corpus(docs, allowed_langs=("en",),
                                  eval_docs=evals, decontam_n=3,
                                  decontam_min_shared=2).collect()}
    assert got[1]["drop_reason"] == "contaminated"
    assert got[1]["n_shared_eval"] >= 2 and got[1]["contaminated"]
    assert got[0]["keep"] and not got[0]["contaminated"]
