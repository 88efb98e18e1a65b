"""Deduplication operators for large-scale training-data pipelines.

Five strategies, each a different cost/recall point at 100 TB:

- exact_dedup        hash-groupBy; one shuffle on the content hash
- ngram_jaccard_pairs exact pairwise Jaccard restricted to candidate
                      pairs that SHARE a shingle (explode + self-join —
                      never all-pairs)
- minhash_lsh_pairs  MinHash signatures (vectorized numpy) -> banded
                      LSH buckets -> bucket-join candidates -> exact
                      verify; the scale path for near-dup text
- simhash_pairs      64-bit SimHash + hamming-ball candidate pairing
                      via band keys
- embedding_neardup  cosine-over-threshold pairs on an embedding column

All pair generators emit (id_a < id_b) canonical pairs. The LSH family
shuffles on SMALL keys (band hash, 16 bytes) — document text never
enters a shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: keeper = min id, plus duplicate count.
    Shuffles md5(text) + id only (map-side partial agg)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
    )


# --- n-gram Jaccard (exact, shingle-candidate-restricted) ---------------------


def shingles_expr(text_col: str, n: int = 3):
    """Word n-gram shingles as an array column (native: split + transform).
    Texts with fewer than n tokens collapse to ONE shingle (the whole
    token list joined): clamping the index range to sequence(0, 0) makes
    slice(toks, 1, n) emit all available tokens — and keeps sequence()
    from ever seeing a descending range (sequence(0,-1) counts DOWN in
    Spark and slice(toks, 0, n) then throws). No CASE around the
    higher-order functions: they are interpreted (not codegen'd) and a
    branch defeats common-subexpression elimination of the token split,
    measured 3x slower on the sf0.1 corpus."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float = 0.5, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets, computed only for
    pairs sharing >=1 shingle. Returns (id_a, id_b, jaccard).

    max_shingle_df — the 100 TB guard: a shingle appearing in f docs
    contributes f*(f-1)/2 rows to the self-join, so ONE boilerplate
    shingle ("all rights reserved …") makes its group quadratic. With a
    cap, shingles with document frequency > max_shingle_df are excluded
    from CANDIDATE GENERATION (pairs sharing only boilerplate shingles
    are not near-dup candidates worth the quadratic cost), and the
    Jaccard of surviving candidates is computed EXACTLY from the full
    shingle arrays (array_intersect over the pair join) — the cap
    bounds the join, it never skews a reported score."""
    # lazy checkpoint: (id, shingle-array) is referenced by up to five
    # subtrees (explode x2 self-join sides, the DF/rare aggregation, and
    # the sh_a/sh_b verify joins) and Catalyst plans each as its own
    # scan+split+transform — the split/shingle work ran up to 5x per
    # document (guide §7.2, duplicated subtrees). Materializing it once
    # (on the first job that needs it; recomputed from inputs on every
    # invocation) makes every reference a stored-partition read.
    sh = df.select(F.col(id_col).alias("id"), shingles_expr(text_col, n).alias("sh")) \
        .localCheckpoint(eager=False)
    ex = sh.select("id", F.explode("sh").alias("s"))
    if max_shingle_df is None:
        # exact path: |A∩B| from the group count, |A∪B| = |A|+|B|-|A∩B|
        sizes = sh.select("id", F.size("sh").alias("sz"))
        inter = (
            ex.alias("a").join(ex.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
            .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # capped path: candidates from non-hot shingles only, then exact
    # verification on the pair's full arrays
    rare = ex.groupBy("s").agg(F.count("*").alias("_df")) \
        .filter(F.col("_df") <= max_shingle_df).select("s")
    exr = ex.join(rare, "s")
    cand = (
        exr.alias("a").join(exr.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- MinHash + LSH ------------------------------------------------------------

_MERSENNE = (1 << 61) - 1

# moduli for the ORACLE-CHECKABLE arithmetic hash family (see
# arith_hash_expr): chosen so every intermediate product stays < 2^63
# and therefore computes identically in numpy int64, Spark long and
# ANSI-SQL BIGINT arithmetic — no wrap-around emulation needed anywhere.
ARITH_MOD_31 = (1 << 31) - 1   # minhash shingle hash + perm modulus:
                               # (2^31-2)^2 + 2^31 < 2^63
ARITH_MOD_57 = 1 << 57         # simhash token hash: (2^57-1)*31 + 127 < 2^63


def arith_hash_expr(col, mod: int = ARITH_MOD_31):
    """Polynomial rolling hash over characters, h = (h*31 + code) % mod,
    as a native Spark column expression. The point of this family is
    that an ANSI-SQL engine (the DuckDB oracle) can recompute it
    exactly — `list_reduce(list_prepend(0, list_transform(
    string_split(s,''), c -> ascii(c))), (a,x) -> (a*31+x) % mod)` —
    which makes the ENTIRE minhash/simhash mechanism (signatures,
    banding, candidate pairs, estimates) value-checkable end to end.
    xxhash64 stays the default at scale (stronger mixing, one codegen'd
    call per element); this is the verification twin."""
    return F.aggregate(
        F.split(col, ""), F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(mod))

_PAD_BUDGET = 1 << 24  # elements per padded chunk (128 MiB of int64)


def _padded_chunks(col: np.ndarray, budget: int | None = None):
    """Slice a batch's list-column into row runs whose padded
    (rows x maxlen) matrix stays under `budget` elements, so ONE long
    outlier document cannot inflate the padding of the whole Arrow
    batch (a 1M-shingle doc in a 10k-row batch would otherwise allocate
    rows x 1M cells). Yields (start, end, H, lens) with H zero-padded
    int64; all-empty rows yield a 1-wide all-padding chunk."""
    if budget is None:
        budget = _PAD_BUDGET  # read at call time so tests can shrink it
    n = len(col)
    lens = np.fromiter((0 if hl is None else len(hl) for hl in col),
                       dtype=np.int64, count=n)
    start = 0
    while start < n:
        end = start + 1
        mx = max(int(lens[start]), 1)
        while end < n:
            nmx = max(mx, int(lens[end]), 1)
            if (end - start + 1) * nmx > budget:
                break
            mx = nmx
            end += 1
        H = np.zeros((end - start, mx), dtype=np.int64)
        for i in range(start, end):
            hl = col[i]
            if hl is not None and len(hl):
                H[i - start, : len(hl)] = hl
        yield start, end, H, lens[start:end]
        start = end


def _perm_params(num_hashes: int, seed: int,
                 mod: int = _MERSENNE) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, mod, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, mod, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame, num_hashes: int = 64, n: int = 3, seed: int = 42,
    id_col: str = "doc_id", text_col: str = "text",
    pad_budget: int | None = None,
    hash_expr=None, perm_mod: int = _MERSENNE,
) -> DataFrame:
    """(id, sig: array<long>) — shingling AND shingle hashing stay
    JVM-side (shingles_expr -> per-element xxhash64, whole-stage
    codegen); Python receives only (id, array<int64>) and performs one
    (num_hashes x num_shingles) broadcasted min per row. No document
    text ever crosses the Arrow boundary and no per-row Python hashing
    remains.

    hash_expr/perm_mod — the oracle-checkable variant: pass
    `hash_expr=arith_hash_expr, perm_mod=ARITH_MOD_31` and every value
    in the signature matrix is exactly reproducible in ANSI SQL (the
    arith hash keeps all products < 2^63, so numpy int64 never wraps
    and positive-operand `%` agrees across engines). Default stays
    xxhash64 + the 2^61-1 Mersenne modulus (the scale path)."""
    a, b = _perm_params(num_hashes, seed, perm_mod)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ])
    sh_hash = hash_expr or (lambda s: F.xxhash64(s))
    # null text -> '' (one empty shingle) instead of a null shingle array:
    # keeps the Python side total on corpora with missing documents
    hashed = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))).select(
        F.col(id_col).alias("id"),
        F.transform(shingles_expr(text_col, n), lambda s: sh_hash(s)).alias("hs"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = len(a)
        for pdf in batches:
            nrows = len(pdf)
            # Padded (rows x maxlen) matrices, CHUNKED to a fixed element
            # budget (skew guard): the k permuted-min reductions are
            # whole-chunk numpy ops (the per-row matmul loop was the
            # dominant cost of dedup-minhash-lsh). int64 wrap-around is
            # deterministic and fine for a hash family; padding cells are
            # masked to the (unreachable) modulus so they never win a min
            # — per-row outputs are byte-identical to the old per-row
            # loop (pinned by the pair-parity tests). Rows with no
            # shingles (coalesced null text never produces them, but be
            # total) come out as all-_MERSENNE sentinels.
            sig = np.empty((nrows, k), dtype=np.int64)
            for start, end, H, lens in _padded_chunks(pdf["hs"].to_numpy(), pad_budget):
                pad = np.arange(H.shape[1], dtype=np.int64)[None, :] >= lens[:, None]
                for j in range(k):
                    mj = (a[j] * H + b[j]) % perm_mod
                    mj[pad] = _MERSENNE
                    sig[start:end, j] = mj.min(axis=1)
            yield pd.DataFrame({"id": pdf["id"].values, "sig": list(sig)})

    return hashed.mapInPandas(gen, schema)


def minhash_lsh_pairs(
    df: DataFrame, num_hashes: int = 64, bands: int = 16, n: int = 3,
    threshold: float = 0.5, seed: int = 42,
    id_col: str = "doc_id", text_col: str = "text",
    hash_expr=None, perm_mod: int = _MERSENNE, exact_bands: bool = False,
    max_band_df: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate generation + signature-estimated Jaccard.

    sig -> `bands` band-hashes -> explode -> groupBy band bucket ->
    within-bucket pairs -> dedup pairs -> estimate jaccard as the
    fraction of agreeing signature positions. Returns
    (id_a, id_b, est_jaccard >= threshold).

    exact_bands — join on the band's VALUE (array<long> key) instead of
    its xxhash64 bucket: removes the (negligible but nonzero) 64-bit
    bucket-collision false-candidate path so the pair set is exactly
    "agrees on some full band" — the property the SQL oracle states.
    Default keeps 8-byte hashed keys (smaller shuffle, the scale path).

    max_band_df — the 100 TB join guard (same pattern as
    hash_neardup_pairs): a band bucket shared by k docs contributes
    k^2/2 candidates, and corpus-wide boilerplate (empty docs, licence
    headers) concentrates into single buckets; with the cap, buckets
    hotter than max_band_df are dropped from candidate generation.
    Default None keeps the exact LSH pair set (oracle parity).
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, n, seed, id_col, text_col,
                              hash_expr=hash_expr, perm_mod=perm_mod)
    if exact_bands:
        band_keys = [F.slice("sig", bi * rows + 1, rows) for bi in range(bands)]
    else:
        band_keys = [
            F.xxhash64(F.lit(bi), F.slice("sig", bi * rows + 1, rows).cast("string"))
            for bi in range(bands)
        ]
    banded = sigs.select(
        "id", "sig",
        F.posexplode(F.array(*band_keys)).alias("band", "bucket"),
    )
    if max_band_df is not None:
        cool = banded.groupBy("band", "bucket") \
            .agg(F.count("*").alias("_df")) \
            .filter(F.col("_df") <= max_band_df).drop("_df")
        banded = banded.join(cool, ["band", "bucket"])
    # merge-join the self-join on purpose: both sides then need the SAME
    # exchange and AQE reuses it, so the signature stage (shingle hashing
    # + the mapInPandas min-reduction) runs ONCE — the planner's
    # broadcast pick built each side as its own subtree and paid the
    # Python stage twice (guide §2.4/§7.2; plan diff in
    # OPTIMIZATION_r06.md). At corpus scale a broadcast of the whole
    # banded table was never the right shape anyway.
    cand = (
        banded.alias("a").hint("merge")
        .join(banded.alias("b").hint("merge"),
              (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
    )
    # estimate BEFORE the pair dedup: est is a pure function of the pair,
    # so filtering first and deduping (id_a, id_b, est) scalars turns the
    # old SortAggregate-over-signature-arrays into a map-side-combinable
    # hash aggregate over three scalar columns (guide §2.3 — aggregate
    # before you shuffle, and never shuffle the 64-long arrays)
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(float(num_hashes)), 6)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


# --- SimHash ------------------------------------------------------------------


def simhash_column(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    pad_budget: int | None = None, hash_expr=None,
) -> DataFrame:
    """(id, simhash long): sign-sum of token-hash bit vectors. Token
    split + hashing stay JVM-side (xxhash64 per distinct-preserving
    token); Python does one (n_tokens x 64) bit unpack + sign-sum per
    row — no strings cross the Arrow boundary.

    hash_expr — the oracle-checkable variant: pass
    `lambda t: arith_hash_expr(t, ARITH_MOD_57)` and every token hash
    (hence every simhash bit) is exactly reproducible in ANSI SQL;
    hash values stay < 2^57 so bits 57..63 of the result are always 0
    and all bit extraction is plain nonnegative arithmetic in both
    engines. Default stays xxhash64 (full 64-bit mixing, scale path)."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ])
    # null text -> '' JVM-side (empty token array, simhash 0) — the old
    # Python path crashed on None with len(None); coalescing restores the
    # treat-missing-as-empty semantics and keeps the loop total
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "")
    tok_hash = hash_expr or (lambda t: F.xxhash64(t))
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: tok_hash(t)).alias("hs"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        one = np.uint64(1)
        for pdf in batches:
            nrows = len(pdf)
            # Padded (rows x maxlen) uint64 matrices, CHUNKED to a fixed
            # element budget (skew guard — see _padded_chunks); the 64
            # per-bit sign-sums are whole-chunk numpy reductions. Padding
            # zeros contribute 0 to every bit count and the sign-sum uses
            # the TRUE length (v = 2*cnt - len), so padded cells are inert
            # — outputs byte-identical to the old per-row loop. Empty/null
            # token lists come out as simhash 0.
            out = np.zeros(nrows, dtype=np.uint64)
            for start, end, H, lens in _padded_chunks(pdf["hs"].to_numpy(), pad_budget):
                Hu = H.view(np.uint64)  # two's-complement reinterpret
                acc = np.zeros(end - start, dtype=np.uint64)
                for bit in range(64):
                    cnt = ((Hu >> np.uint64(bit)) & one).sum(axis=1).astype(np.int64)
                    v = 2 * cnt - lens
                    acc |= (v > 0).astype(np.uint64) << np.uint64(bit)
                out[start:end] = acc
            yield pd.DataFrame({"id": pdf["id"].values,
                                "simhash": out.astype(np.int64)})

    return hashed.mapInPandas(gen, schema)


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    hash_expr=None, max_band_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Candidate generation: split the 64-bit hash into (max_hamming+1)
    bands — any pair within the hamming ball agrees on >=1 full band
    (pigeonhole), so the join is on band keys, never all-pairs. The
    banding is EXACT (keys are the hash's own bits, no rehash), so the
    output is precisely {pairs : hamming <= max_hamming} — which is
    what the SQL oracle of the arith-hash variant states all-pairs."""
    sh = simhash_column(df, id_col, text_col, hash_expr=hash_expr)
    return hash_neardup_pairs(sh, id_col="id", hash_col="simhash",
                              max_hamming=max_hamming,
                              max_band_df=max_band_df)


def hash_neardup_pairs(
    df: DataFrame, id_col: str = "image_id", hash_col: str = "phash",
    max_hamming: int = 3, max_band_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by hamming distance over an ALREADY-COMPUTED
    64-bit hash column — the image-payload dedup primitive (phash from
    the corpus/input_hint schema) and the shared banding engine behind
    simhash_pairs.

    Pigeonhole banding: split the 64 bits into (max_hamming+1) bands;
    any pair within the hamming ball agrees on >= 1 full band, so
    candidates come from same-(band, key) buckets only — never
    all-pairs, and the bucket join shuffles (id, hash, key) ints only.
    The banding is EXACT (keys are the hash's own bits, no rehash), so
    the output is precisely {pairs : hamming <= max_hamming} — fully
    reproducible by a SQL oracle as all-pairs bit_count(xor(...)).
    JVM-native end to end (no Python rows).

    max_band_df — the 100 TB join guard (same pattern as
    ngram_jaccard_pairs' max_shingle_df): a band key shared by k rows
    contributes k^2/2 candidate pairs, and a 16-bit band has only 65536
    distinct values, so a degenerate hash population (e.g. the all-zero
    phash of decode failures, or any corpus-wide boilerplate bit
    pattern) turns one bucket quadratic. With a cap, buckets whose key
    is shared by more than max_band_df rows are dropped from candidate
    generation — pairs supported ONLY by hot buckets are lost
    (documented trade, exactly like the shingle cap); planted/typical
    near-dups whose agreeing band is rare are unaffected. Default None
    keeps the exact pair set (bounded inputs / the oracle path)."""
    nb = max_hamming + 1
    width = 64 // nb
    banded = df.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h"),
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col(hash_col), bi * width) % F.lit(1 << width)
            for bi in range(nb)
        ])).alias("band", "key"),
    )
    if max_band_df is not None:
        cool = banded.groupBy("band", "key") \
            .agg(F.count("*").alias("_df")) \
            .filter(F.col("_df") <= max_band_df).drop("_df")
        banded = banded.join(cool, ["band", "key"])
    # merge-join the self-join: identical exchanges on both sides are
    # reused (AQE), so the hash column's producer (for simhash_pairs a
    # mapInPandas stage) runs once instead of once per side; hamming is
    # a pure function of the pair, so computing it BEFORE the dedup
    # keeps the aggregate on three scalars (map-side combinable) and
    # drops over-distance candidates before they shuffle (guide §2.3)
    pairs = (
        banded.alias("a").hint("merge")
        .join(banded.alias("b").hint("merge"),
              (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


# --- embedding near-dup -------------------------------------------------------


def cosine_expr(a, b):
    """dot/(|a|*|b|), three plain folds. A single-fold rewrite with a
    struct accumulator was A/B'd in the r6 optimization round and
    measured ~1.8x SLOWER (per-element struct allocation in the
    interpreted HOF evaluator outweighs the two saved array passes;
    the fully-unrolled getItem form was worse still) — so the simple
    per-sum folds stay. When one side is a driver-known constant
    vector use cosine_query_expr below instead: it skips that side's
    norm pass entirely."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def cosine_query_expr(a, query_vec) -> "F.Column":
    """cosine(a, query_vec) where query_vec is a driver-side constant:
    the query's norm is replicated in Python with the SAME left-to-right
    IEEE-double fold the JVM expression would run (0.0 + x*x per
    element, then sqrt), so the result is bit-identical to
    cosine_expr(a, lit(query_vec)) while evaluating one array pass
    fewer per row (~20% on the brute-force scoring stage, measured in
    OPTIMIZATION_r06.md)."""
    import math

    q = [float(x) for x in query_vec]
    ql = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(F.zip_with(a, ql, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    acc = 0.0
    for x in q:
        acc = acc + x * x
    return dot / (na * F.lit(math.sqrt(acc)))


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Cosine-over-threshold pairs. Without block_col this is the exact
    O(n^2) path (bounded inputs only); at scale pass a block column
    (e.g. an LSH bucket from similarity.lsh_bucket) to restrict the join."""
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"),
                   *( [F.col(block_col).alias("blk")] if block_col else [] ))
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
        pairs = e.alias("a").join(e.alias("b"), cond)
    else:
        pairs = e.alias("a").join(e.alias("b"), cond)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# --- winnowing fingerprints (MOSS) -------------------------------------------


def winnow_fingerprints(df: DataFrame, k: int = 8, window: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        hash_expr=None) -> DataFrame:
    """(id, fp) — one row per distinct winnowing fingerprint of each
    document (functions/textstats.winnow_grams_expr + winnow_minima_expr,
    two projections so the gram hashing runs once, not once per window).
    All native expressions; nothing crosses into Python."""
    from ..functions.textstats import winnow_grams_expr, winnow_minima_expr

    grams = df.select(F.col(id_col).alias("id"),
                      winnow_grams_expr(F.col(text_col), k, hash_expr).alias("_g"))
    return grams.select("id", F.explode(winnow_minima_expr(F.col("_g"), window))
                        .alias("fp"))


def fingerprint_overlap_pairs(df: DataFrame, min_shared: int = 2,
                              k: int = 8, window: int = 4,
                              id_col: str = "doc_id", text_col: str = "text",
                              hash_expr=None, max_fp_df: int | None = None) -> DataFrame:
    """Candidate near-dup pairs by shared winnowing fingerprints (the
    MOSS report step): join documents on fingerprint, count distinct
    shared prints per pair, keep pairs with >= min_shared. The join is
    on 8-byte fingerprint keys — document text never shuffles.

    max_fp_df — the same 100 TB guard as ngram_jaccard_pairs'
    max_shingle_df: a fingerprint appearing in f docs contributes
    f*(f-1)/2 join rows, so boilerplate prints are excluded from pair
    generation above the cap."""
    fps = winnow_fingerprints(df, k, window, id_col, text_col, hash_expr)
    if max_fp_df is not None:
        rare = fps.groupBy("fp").agg(F.count("*").alias("_df")) \
            .filter(F.col("_df") <= max_fp_df).select("fp")
        fps = fps.join(rare, "fp")
    return (
        fps.alias("a")
        .join(fps.alias("b"), (F.col("a.fp") == F.col("b.fp"))
              & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
