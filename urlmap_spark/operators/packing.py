"""Shard packing and deterministic sampling — the last-mile operators
of a training-data pipeline: after curation (plans/curate.py) the kept
documents are (a) SAMPLED into a training mix (per-language /
per-source rates) and (b) PACKED into fixed-token-budget shards for
the trainer. Both must be deterministic functions of the data — rand()
resamples differently per retry/partition and breaks resume — and
neither may funnel the corpus through one task.

- hash_sample / stratified_sample: Bernoulli by KEYED HASH
  (xxhash64(key) mod 1e6 < rate*1e6). Same key -> same verdict on every
  run, any partitioning, any cluster size; adding data never flips
  existing rows (the property reservoir sampling lacks). The
  `hash_expr` hook swaps in dedup.arith_hash_expr, the ANSI-SQL-
  recomputable family, which is how the DuckDB oracle value-checks the
  mechanism (same pattern as dedup-minhash-arith).

- pack_shards: contiguous token-budget bucketing. shard id =
  floor(exclusive-prefix-sum(tokens) / budget) in a caller-fixed total
  order — every shard's token sum lands in [budget - straddle, budget +
  straddle) where straddle < its first/last doc, which is what shard
  assembly needs. The prefix sum uses the materialized-range-layout
  pattern of order.with_global_order (one stored range shuffle ->
  per-partition sums, a tiny driver collect -> broadcast offsets ->
  zero-shuffle per-partition cumsum): NO partitionless window, nothing
  O(corpus) on the driver or in one task.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "arith_mix_expr",
    "hash_sample",
    "stratified_sample",
    "with_running_total",
    "pack_shards",
]

_GRAIN = 1_000_000  # rate resolution: 1e-6
_SALT = "mix:"  # short-key guard: the polynomial arith hash of a bare
# 1-4 char key stays BELOW the 1e6 grain (h < 128*31^3), so `% grain`
# would be the raw hash and small ids would all land under mid-size
# rate cutoffs. Prefixing a salt makes every hashed string long enough
# to wrap the 2^31-1 modulus several times; xxhash64 doesn't need the
# guard but takes it too so both families sample the same key string.


_MIX_M = (1 << 31) - 1  # prime modulus shared with dedup.ARITH_MOD_31
_MIX_A, _MIX_B = 48271, 11  # multiplicative permutation (48271 = the
# MINSTD multiplier; invertible mod the prime, same construction as
# dedup._perm_params). Products stay < 2^47 — no 64-bit overflow.


def arith_mix_expr(col):
    """ANSI-SQL-recomputable WELL-MIXED hash: dedup.arith_hash_expr
    followed by (h*A + B) % M. The raw polynomial hash is NOT a mixer —
    consecutive keys land in consecutive slots inside narrow bands
    (measured: 80% of 500 salted doc_ids under the 0.35 cutoff) — but
    the multiplicative permutation spreads it uniformly (0.350 at 500
    keys, 0.34999 at 100k). This is the oracle-verification twin of
    xxhash64 for SAMPLING; the plain arith hash remains fine for
    minhash/winnowing where only equality/min matter."""
    from urlmap_spark.operators.dedup import arith_hash_expr

    return (arith_hash_expr(col, _MIX_M) * F.lit(_MIX_A) + F.lit(_MIX_B)) % F.lit(
        _MIX_M
    )


def _keep_expr(key, rate_expr, hash_expr=None):
    salted = F.concat(F.lit(_SALT), key)
    h = hash_expr(salted) if hash_expr is not None else F.xxhash64(salted)
    # pmod: xxhash64 is signed; arith_hash_expr is already non-negative
    slot = F.pmod(h, F.lit(_GRAIN))
    return slot < F.floor(rate_expr * _GRAIN)


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    hash_expr=None,
) -> DataFrame:
    """Deterministic Bernoulli(rate) keyed on key_col (cast to string so
    the hash family is id-type-agnostic)."""
    key = F.col(key_col).cast("string")
    return df.where(_keep_expr(key, F.lit(float(rate)), hash_expr))


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    hash_expr=None,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix operator
    (e.g. keep 35% of en, all of de, none of the rest). Strata missing
    from `rates` get default_rate. One codegen'd filter, no shuffle."""
    key = F.col(key_col).cast("string")
    rate_map = F.create_map(
        *[x for s, r in rates.items() for x in (F.lit(s), F.lit(float(r)))]
    )
    rate = F.coalesce(rate_map[F.col(strata_col)], F.lit(float(default_rate)))
    return df.where(_keep_expr(key, rate, hash_expr))


def with_running_total(
    df: DataFrame,
    sort_cols: Sequence[str],
    value_col: str,
    total_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds total_col = EXCLUSIVE prefix sum of value_col in sort_cols
    order (first row gets 0). One materialized range layout (the r6
    with_global_order pattern): range-repartition + local sort, EAGER
    localCheckpoint, per-partition sums to the driver (one long per
    task, read from the STORED partitions), then a zero-shuffle
    per-partition cumulative sum (Arrow batches, numpy int64 cumsum)
    seeded with the broadcast offsets. Sort keys must be distinct per
    row (ties spanning a range boundary would make the prefix
    partition-dependent). A null value counts as 0 (it would otherwise
    poison every downstream prefix).

    Why materialize: the pre-r6 form ran the range shuffle lineage
    TWICE (once under the stats collect, once under the consumer's
    action) — double-executing the child plan (for pack_shards, the
    token count over every document) AND re-sampling the range
    boundaries between the two runs, which past the sampler's
    reservoir could place a boundary differently and mis-seed the
    offsets. It also paid a second full shuffle + sort for the
    window's hashpartitioning(_pid). Stored partitions make the sums,
    the cumsum and every consumer read ONE layout: exact, single
    execution, no extra exchange (measured in OPTIMIZATION_r06.md)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in sort_cols]
    val = F.coalesce(F.col(value_col).cast("long"), F.lit(0))
    ranged = (
        # lazy ckpt: the range exchange's boundary-sampling job doubles
        # as the child's materialization (order.py, same rationale)
        df.localCheckpoint(eager=False)
        .repartitionByRange(num_partitions, *keys)
        .sortWithinPartitions(*keys)
        .localCheckpoint(eager=True)
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    sums = {
        r["_pid"]: r["s"]
        for r in with_pid.groupBy("_pid")
        .agg(F.sum(val).alias("s"))
        .collect()
    }
    if not sums:
        return df.withColumn(total_col, F.lit(None).cast("long"))
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)

    out_schema = with_pid.select(
        "*", F.lit(0).cast("long").alias(total_col)).drop("_pid").schema
    out_cols = [f.name for f in out_schema.fields]

    def _cum(batches):
        import numpy as np

        carry = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = offsets[int(pdf["_pid"].iloc[0])]
            v = pdf[value_col].fillna(0).to_numpy(dtype="int64", na_value=0)
            c = np.cumsum(v)
            pdf = pdf.drop(columns=["_pid"])
            pdf[total_col] = carry + c - v  # exclusive prefix
            carry += int(c[-1]) if len(c) else 0
            yield pdf[out_cols]

    # zero-shuffle projection over the stored layout: each task is one
    # stored partition, batches arrive in stored (sorted) row order
    return with_pid.mapInPandas(_cum, out_schema)


def pack_shards(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    sort_cols: Sequence[str] = ("doc_id",),
    shard_col: str = "shard",
) -> DataFrame:
    """Assigns every row a shard id so consecutive rows (in sort_cols
    order) fill ~`budget` tokens per shard: shard = floor(exclusive
    prefix sum / budget). A document belongs to the shard its FIRST
    token lands in, so shard token totals straddle the budget by at
    most one document. Deterministic, partitioning-invariant, and the
    downstream writer can partitionBy(shard) without another sort."""
    out = with_running_total(df, sort_cols, token_col)
    return out.withColumn(
        shard_col, F.floor(F.col("cum_before") / F.lit(int(budget))).cast("long")
    )
