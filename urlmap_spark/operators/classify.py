"""Hashed-feature linear text classifier: the MODEL-BASED quality
filter stage of GPT-3/CCNet-style curation pipelines (Brown et al.
2020 appendix A; Wenzek et al. 2020) — score a document by hashing its
tokens into a fixed-dimension weight vector and summing:

    margin(doc) = bias + sum_t  w[ hash(token_t) % dim ]
    score(doc)  = sigmoid(margin)

This is the "fasttext-shaped" linear scorer every large corpus
pipeline runs between the heuristic quality gate and dedup; the model
itself (the weight vector) is an input — training it is out of scope,
applying it at 100 TB is exactly this engine's job.

Scale shape: everything here is a single whole-stage-codegen
projection — tokenize (native split/filter), hash (xxhash64), index
(pmod), weight lookup (array-literal element_at), sum (F.aggregate).
No shuffle, no Python, no UDF: the classifier adds zero exchanges to a
curation plan. Trained weights ride into the plan as ONE array literal
(fine into the tens of thousands of dimensions — a 64k-float literal
is ~0.5 MiB of plan; beyond that, join a weights TABLE keyed by the
feature index instead).

Verification: with `hash_expr=packing.arith_mix_expr` and the default
dyadic pseudo-weights, every margin is EXACTLY reproducible in ANSI
SQL — weights are dyadic rationals k/1024, so double-precision sums
are exact (integers/1024 stay below 2^53) and order-independent: the
DuckDB oracle matches bit-for-bit with no rounding tolerance anywhere
(quality-classifier-arith). The reference crawler has no corpus
pipeline; this operator belongs to the training-data mandate like
operators/dedup.py and plans/curate.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urlmap_spark.functions.textstats import tokens_expr

__all__ = [
    "feature_index_expr",
    "dyadic_weight_expr",
    "dyadic_weights_df",
    "hashed_margin_expr",
    "classifier_score",
    "classifier_score_table",
]


def feature_index_expr(token: Column, dim: int, hash_expr=None) -> Column:
    """Feature slot of one token: hash(token) mod dim, in [0, dim).
    xxhash64 by default (signed — hence pmod); pass
    `packing.arith_mix_expr` for the SQL-recomputable twin."""
    h = hash_expr(token) if hash_expr is not None else F.xxhash64(token)
    return F.pmod(h, F.lit(dim))


# dyadic pseudo-weight parameters: slot -> ((slot*A + B) % 2049 - 1024)
# / 1024, a deterministic value in [-1, 1] whose denominator is a power
# of two. 48271 = the MINSTD multiplier (same family as packing's mix).
_DYW_A, _DYW_B, _DYW_MOD, _DYW_HALF = 48271, 101, 2049, 1024


def dyadic_weight_expr(idx: Column) -> Column:
    """Deterministic pseudo-weight for slot `idx`: a dyadic rational
    k/1024 in [-1, 1]. Because every weight has denominator 1024 and
    per-doc sums stay far below 2^53/1024, the double-precision margin
    is EXACT and addition-order-independent — Spark and an ANSI-SQL
    oracle agree bit-for-bit with no rounding tolerance. This is the
    verification twin of a trained weight vector (real deployments pass
    `weights=` to hashed_margin_expr instead)."""
    return (
        (idx * F.lit(_DYW_A) + F.lit(_DYW_B)) % F.lit(_DYW_MOD) - F.lit(_DYW_HALF)
    ) / F.lit(float(_DYW_HALF))


def hashed_margin_expr(
    text: Column,
    dim: int,
    weights: Sequence[float] | None = None,
    bias: float = 0.0,
    hash_expr=None,
) -> Column:
    """Raw decision margin of one document (see module docstring).
    Null text scores like empty text (margin = bias) — the
    ADVICE-r2 null contract every text operator here follows.

    weights: the trained weight vector (len(weights) overrides `dim`),
    embedded as one array literal; None -> dyadic_weight_expr."""
    toks = tokens_expr(F.lower(F.coalesce(text, F.lit(""))))
    if weights is not None:
        dim = len(weights)
        arr = F.lit([float(w) for w in weights])

        def w_of(t: Column) -> Column:
            # element_at is 1-based; index fits int (dim is a Python int)
            return F.element_at(
                arr, (feature_index_expr(t, dim, hash_expr) + 1).cast("int")
            )

    else:

        def w_of(t: Column) -> Column:
            return dyadic_weight_expr(feature_index_expr(t, dim, hash_expr))

    return F.aggregate(
        toks, F.lit(float(bias)), lambda acc, t: acc + w_of(t)
    )


def dyadic_weights_df(spark, dim: int) -> DataFrame:
    """The dyadic pseudo-weight vector as a (slot int, weight double)
    DataFrame — the verification twin of a production weights TABLE
    (a trained vector stored in parquet/Iceberg keyed by feature slot).
    Same formula as dyadic_weight_expr, so the table path and the
    literal path produce bit-identical margins."""
    return spark.range(dim).select(
        F.col("id").cast("int").alias("slot"),
        dyadic_weight_expr(F.col("id")).alias("weight"),
    )


def classifier_score_table(
    df: DataFrame,
    weights: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    hash_expr=None,
    margin_col: str = "clf_margin",
    score_col: str = "clf_score",
) -> DataFrame:
    """Production-weights path: the same hashed-feature margin with the
    weight vector as a (slot int, weight double) DataFrame instead of a
    plan literal. This is the scale form for dims beyond the array-
    literal bound (classifier_score's documented tens-of-thousands
    limit): a 10^6- or 10^8-dim trained vector lives in a table, not in
    the query plan.

    Scale shape: tokens explode to (id, slot) rows — 16 bytes each, the
    narrowest possible feature stream — then ONE BroadcastExchange
    ships the weight table to every executor (a 10^6-dim double vector
    is 12 MiB, far under the broadcast threshold), the feature-weight
    lookup is a broadcast hash join probe, and the per-doc sum is a
    map-side-combinable groupBy. The corpus itself never carries its
    text through a shuffle: only (id, slot) rows and (id, margin) rows
    move. Missing slots (weight rows absent from the table) score 0,
    so a sparse trained vector can store only its non-zero entries.

    Verification: with hash_expr=arith_mix_expr and
    weights=dyadic_weights_df the margins are exact dyadic sums —
    order-independent, so the shuffled groupBy matches the ANSI-SQL
    oracle bit-for-bit (quality-classifier-table), and matches
    classifier_score's aggregate-literal margins exactly
    (pytest-pinned)."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            tokens_expr(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        ).alias("_tok"),
    )
    feats = toks.select(
        F.col(id_col),
        feature_index_expr(F.col("_tok"), dim, hash_expr)
        .cast("int")
        .alias("_slot"),
    )
    looked = feats.join(
        F.broadcast(weights), feats["_slot"] == weights["slot"], "left"
    ).select(F.col(id_col), F.coalesce(F.col("weight"), F.lit(0.0)).alias("_w"))
    margins = looked.groupBy(id_col).agg(
        (F.sum("_w") + F.lit(float(bias))).alias(margin_col)
    )
    out = df.join(margins, id_col, "left").withColumn(
        margin_col, F.coalesce(F.col(margin_col), F.lit(float(bias)))
    )
    return out.withColumn(
        score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(margin_col)))
    )


def classifier_score(
    df: DataFrame,
    dim: int = 1 << 16,
    weights: Sequence[float] | None = None,
    text_col: str = "text",
    bias: float = 0.0,
    hash_expr=None,
    margin_col: str = "clf_margin",
    score_col: str = "clf_score",
) -> DataFrame:
    """df + (clf_margin double, clf_score double): the linear margin
    and its sigmoid. One codegen'd projection; all columns pass
    through."""
    out = df.withColumn(
        margin_col,
        hashed_margin_expr(
            F.col(text_col), dim, weights=weights, bias=bias, hash_expr=hash_expr
        ),
    )
    return out.withColumn(
        score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(margin_col)))
    )
