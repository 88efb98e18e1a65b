"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set (the GPT-3 appendix-C /
PaLM-style n-gram-overlap decontamination pass). Part of the
training-data mandate — the reference crawler has no corpus ops.

Scale shape (the part that matters at 100 TB): the EVAL side is small
(benchmarks are thousands of documents), so its distinct gram set is
broadcast; the corpus side explodes grams but the broadcast hash join
filters them in the SAME stage — non-matching grams (virtually all of
them) die before any exchange. The only shuffle is the
(doc_id, gram)-distinct count over the survivors, which is tiny and
map-side-combinable. The corpus is never joined against itself and
never shuffled whole.

Reuses dedup.shingles_expr (urlmap_spark/operators/dedup.py:47) so the
tokenization/clamp conventions — and therefore the DuckDB oracle twin
(__spark_entry__.oracle_sql['decontam-ngram']) — are shared with the
n-gram dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from urlmap_spark.operators.dedup import shingles_expr

__all__ = ["contamination"]


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """(id, n_shared, contaminated) for every doc: n_shared = number of
    DISTINCT word n-grams of the doc that appear anywhere in the eval
    set; contaminated = n_shared >= min_shared. Documents (and eval
    rows) shorter than n tokens clamp to one whole-text gram, same as
    shingles_expr."""
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_expr(text_col, n)).alias("g"),
    )
    eval_grams = (
        eval_docs.select(F.explode(shingles_expr(eval_text_col, n)).alias("g"))
        .distinct()
    )
    shared = (
        doc_grams.join(broadcast(eval_grams), "g")
        # shingles_expr already distincts per doc, so a plain count is
        # a distinct-gram count — no countDistinct shuffle needed
        .groupBy("id")
        .agg(F.count("*").cast("int").alias("n_shared"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(shared, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )
