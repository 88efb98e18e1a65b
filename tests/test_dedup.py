"""Training-data dedup operators: exact, n-gram Jaccard, MinHash-LSH,
SimHash, embedding near-dup — correctness on constructed corpora."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from urlmap_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base.replace("lazy", "sleepy")),         # near dup of 0
        (3, "completely different text about spark shuffle partitions and joins"),
        (4, base.replace("today", "tomorrow")),      # near dup of 0
        (5, "another unrelated document mentioning parquet files and bloom filters"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r["keeper_id"]: r["dup_count"] for r in D.exact_dedup(docs).collect()}
    assert out[0] == 2          # docs 0 and 1 collapse
    assert sum(out.values()) == 6
    assert len(out) == 5


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.5, n=3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    assert (0, 4) in pairs
    assert not any(3 in p or 5 in p for p in pairs)


def test_shingles_short_docs_do_not_blow_up(spark):
    """Docs with fewer than n tokens collapse to one whole-text shingle
    (regression: sequence(0,-1) counted DOWN and slice(toks, 0, n)
    threw on 1-2-token docs)."""
    rows = [(0, "one"), (1, "two words"), (2, "three words here"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", D.shingles_expr("text", 3).alias("s")).collect()}
    assert sh[0] == ["one"]
    assert sh[1] == ["two words"]
    assert sh[2] == ["three words here"]
    assert sh[3] == [""]
    # and the pair pipeline runs end-to-end on them
    assert {(r["id_a"], r["id_b"]) for r in
            D.ngram_jaccard_pairs(docs, threshold=0.9, n=3).collect()} == set()


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in D.minhash_lsh_pairs(docs, num_hashes=64, bands=16,
                                          threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0          # identical docs always collide
    assert (0, 2) in pairs or (0, 4) in pairs  # near dups found
    assert not any((3 in p or 5 in p) for p in pairs)


def test_minhash_estimate_tracks_true_jaccard(spark, docs):
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in D.minhash_lsh_pairs(docs, num_hashes=64, bands=32,
                                        threshold=0.0).collect()}
    true = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(docs, threshold=0.0, n=3).collect()}
    for p, e in est.items():
        if p in true:
            assert abs(e - true[p]) < 0.3, (p, e, true[p])


def test_ngram_jaccard_shingle_df_cap_bounds_candidates(spark):
    """Hot-shingle corpus: every doc shares one boilerplate shingle, so
    the uncapped self-join is quadratic (n*(n-1)/2 candidate pairs).
    With max_shingle_df the hot shingle is excluded from candidate
    generation — the join stays bounded — while true near-dups (sharing
    RARE shingles) are still found with their EXACT jaccard."""
    boiler = "all rights reserved by the site"
    n = 60
    rows = [(i, f"unique words number {i} " + boiler) for i in range(n)]
    rows[1] = (1, rows[0][1])  # 1 is an exact dup of 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = D.ngram_jaccard_pairs(docs, threshold=0.0, n=3)
    assert uncapped.count() == n * (n - 1) // 2  # the quadratic blow-up

    capped = D.ngram_jaccard_pairs(docs, threshold=0.0, n=3, max_shingle_df=10)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    # candidate set bounded: only pairs sharing a rare shingle survive
    assert len(pairs) < n * (n - 1) // 2 / 10
    # capped jaccard values are EXACT (verified on full shingle arrays)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in uncapped.collect()}
    for p, j in pairs.items():
        assert j == exact[p], p


def test_embedding_neardup_sign_block(spark):
    """sign_block restricts the near-dup join to deterministic axis-sign
    buckets; high-threshold pairs (near-identical vectors) agree on
    signs, so recall at 0.95 is unaffected on this corpus."""
    from urlmap_spark.operators.similarity import sign_block

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        v = rng.standard_normal(16)
        v[:3] += np.sign(v[:3]) * 0.2  # keep blocked dims off the boundary
        rows.append((2 * i, v.tolist()))
        rows.append((2 * i + 1, (v + 0.01 * rng.standard_normal(16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    blocked = sign_block(emb, dims=[0, 1, 2])
    got = {(r["id_a"], r["id_b"]) for r in D.embedding_neardup_pairs(
        blocked, threshold=0.95, block_col="blk").collect()}
    want = {(r["id_a"], r["id_b"]) for r in D.embedding_neardup_pairs(
        emb, threshold=0.95).collect()}
    assert got == want
    assert {(2 * i, 2 * i + 1) for i in range(40)} <= got


def test_simhash_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 10
    assert (3, 5) not in pairs


def test_simhash_deterministic(spark, docs):
    a = sorted(tuple(r) for r in D.simhash_column(docs).collect())
    b = sorted(tuple(r) for r in D.simhash_column(docs.repartition(7)).collect())
    assert a == b


def test_embedding_neardup(spark):
    rng = np.random.default_rng(1)
    base = rng.standard_normal(16)
    rows = [
        (0, base.tolist()),
        (1, (base + 0.01 * rng.standard_normal(16)).tolist()),  # near dup
        (2, rng.standard_normal(16).tolist()),
        (3, (-base).tolist()),                                    # anti-parallel
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in D.embedding_neardup_pairs(emb, threshold=0.9).collect()}
    assert list(pairs) == [(0, 1)]
    assert pairs[(0, 1)] > 0.99


def test_null_text_tolerated(spark):
    """Null text rows must not crash the Arrow loops (regression: the
    simhash batch did len(None)); they behave as empty text."""
    rows = [(0, "some real document text here"), (1, None), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["id"]: r["simhash"] for r in D.simhash_column(docs).collect()}
    assert sh[1] == 0 and sh[2] == 0 and sh[0] != 0
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(docs, num_hashes=8).collect()}
    assert len(sigs) == 3 and all(len(s) == 8 for s in sigs.values())
    # null and '' collapse to the same ''-shingle signature
    assert sigs[1] == sigs[2]


def test_padded_chunks_skew_guard():
    """One long outlier row must not inflate the padded width of the
    whole batch: chunks respect the element budget (a single row longer
    than the budget stands alone, bounding peak memory at the old
    per-row level)."""
    import numpy as np

    col = np.empty(5, dtype=object)
    col[:] = [[1, 2, 3], None, list(range(50)), [7], []]
    chunks = list(D._padded_chunks(col, budget=16))
    assert sum(e - s for s, e, _, _ in chunks) == 5
    ends = [e for _, e, _, _ in chunks]
    starts = [s for s, _, _, _ in chunks]
    assert starts == [0] + ends[:-1]  # contiguous, in order
    for s, e, H, lens in chunks:
        assert H.shape[0] == e - s and len(lens) == e - s
        assert H.shape[0] * H.shape[1] <= 16 or H.shape[0] == 1
        for i in range(s, e):
            want = col[i] if col[i] is not None else []
            assert list(H[i - s, : len(want)]) == list(want)
            assert (H[i - s, len(want):] == 0).all()


def test_chunked_signatures_match_unchunked(spark, docs):
    """Forcing a tiny chunk budget (many chunks per batch, every doc its
    own chunk) must not change a single minhash signature or simhash
    value. pad_budget is a real closure-captured parameter so it reaches
    executor workers (a module monkeypatch would not)."""
    base_sig = sorted((r["id"], list(r["sig"]))
                      for r in D.minhash_signatures(docs, num_hashes=16).collect())
    base_sim = sorted(tuple(r) for r in D.simhash_column(docs).collect())
    tiny_sig = sorted((r["id"], list(r["sig"]))
                      for r in D.minhash_signatures(docs, num_hashes=16,
                                                    pad_budget=8).collect())
    tiny_sim = sorted(tuple(r)
                      for r in D.simhash_column(docs, pad_budget=8).collect())
    assert tiny_sig == base_sig
    assert tiny_sim == base_sim


# --- oracle-checkable arithmetic hash family ---------------------------------


def _py_arith_hash(s: str, mod: int) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % mod
    return h


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) <= n:
        return list(dict.fromkeys([" ".join(toks[:n])]))
    out = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return list(dict.fromkeys(out))


def test_arith_hash_expr_matches_python(spark):
    rows = [(0, "abc"), (1, "key agg"), (2, ""), (3, "the quick brown fox")]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {r["i"]: r["h"] for r in df.select(
        "i", D.arith_hash_expr(F.col("s"), D.ARITH_MOD_31).alias("h")).collect()}
    for i, s in rows:
        assert got[i] == _py_arith_hash(s, D.ARITH_MOD_31), s


def test_minhash_arith_signatures_match_reference(spark, docs):
    """The arith-hash variant's signature matrix equals an independent
    pure-Python recomputation — every value, not a sample (this is the
    invariant the DuckDB oracle of dedup-minhash-arith states)."""
    k, seed = 16, 42
    a, b = D._perm_params(k, seed, D.ARITH_MOD_31)
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(
        docs, num_hashes=k, n=3, seed=seed,
        hash_expr=lambda s: D.arith_hash_expr(s, D.ARITH_MOD_31),
        perm_mod=D.ARITH_MOD_31).collect()}
    for did, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        hs = [_py_arith_hash(s, D.ARITH_MOD_31) for s in _py_shingles(text)]
        want = [min((int(a[j]) * x + int(b[j])) % D.ARITH_MOD_31 for x in hs)
                for j in range(k)]
        assert sigs[did] == want, did


def test_minhash_arith_exact_bands_pairs(spark, docs):
    """exact_bands pair set == 'agrees on some full band', recomputed
    from the signatures themselves."""
    k, bands, seed = 16, 4, 42
    rows = k // bands
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(
        docs, num_hashes=k, n=3, seed=seed,
        hash_expr=lambda s: D.arith_hash_expr(s, D.ARITH_MOD_31),
        perm_mod=D.ARITH_MOD_31).collect()}
    want = set()
    ids = sorted(sigs)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1:]:
            if any(sigs[ia][bi * rows:(bi + 1) * rows] == sigs[ib][bi * rows:(bi + 1) * rows]
                   for bi in range(bands)):
                want.add((ia, ib))
    got = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(
        docs, num_hashes=k, bands=bands, threshold=0.0, seed=seed,
        hash_expr=lambda s: D.arith_hash_expr(s, D.ARITH_MOD_31),
        perm_mod=D.ARITH_MOD_31, exact_bands=True).collect()}
    assert got == want


def test_simhash_arith_matches_reference_and_bruteforce(spark, docs):
    """Arith simhash values match a pure-Python recomputation, and the
    banded pair set equals brute-force hamming<=k over those values."""
    mod = D.ARITH_MOD_57
    sh = {r["id"]: r["simhash"] for r in D.simhash_column(
        docs, hash_expr=lambda t: D.arith_hash_expr(t, mod)).collect()}
    for did, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        toks = [t for t in text.lower().split() if t]
        hs = [_py_arith_hash(t, mod) for t in toks]
        want = 0
        for bit in range(64):
            cnt = sum((h >> bit) & 1 for h in hs)
            if 2 * cnt - len(hs) > 0:
                want |= 1 << bit
        assert sh[did] == want, did
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in D.simhash_pairs(
        docs, max_hamming=3,
        hash_expr=lambda t: D.arith_hash_expr(t, mod)).collect()}
    ids = sorted(sh)
    want_pairs = {(a, b, bin(sh[a] ^ sh[b]).count("1"))
                  for i, a in enumerate(ids) for b in ids[i + 1:]
                  if bin(sh[a] ^ sh[b]).count("1") <= 3}
    assert got == want_pairs


def test_default_xxhash_path_unchanged_by_parameterization(spark, docs):
    """Guard: adding hash_expr/perm_mod must not perturb the default
    minhash signatures (rng stream and modulus identical)."""
    s1 = {r["id"]: r["sig"] for r in
          D.minhash_signatures(docs, num_hashes=8, seed=7).collect()}
    s2 = {r["id"]: r["sig"] for r in
          D.minhash_signatures(docs, num_hashes=8, seed=7,
                               hash_expr=None, perm_mod=D._MERSENNE).collect()}
    assert s1 == s2


# --- winnowing fingerprints (MOSS) -------------------------------------------


def _py_winnow(text: str, k: int = 8, window: int = 4,
               mod: int = D.ARITH_MOD_31) -> set[int]:
    t = (text or "").lower()
    n_grams = max(len(t) - k + 1, 1)
    grams = [_py_arith_hash(t[i:i + k], mod) for i in range(n_grams)]
    n_win = max(len(grams) - window + 1, 1)
    return {min(grams[j:j + window]) for j in range(n_win)}


def test_winnow_fingerprints_match_python_reference(spark, docs):
    got = {}
    for r in D.winnow_fingerprints(
            docs, k=8, window=4,
            hash_expr=lambda g: D.arith_hash_expr(g, D.ARITH_MOD_31)).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for did, text in [(r["doc_id"], r["text"]) for r in docs.collect()]:
        assert got[did] == _py_winnow(text), did


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing's core property: two documents sharing a substring of
    length >= k + window - 1 share at least one fingerprint."""
    shared = "identical boilerplate fragment here"
    rows = [(0, f"prefix alpha {shared} suffix beta"),
            (1, f"other start {shared} completely different end"),
            (2, "nothing in common with the rest at all whatsoever")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in D.winnow_fingerprints(df, k=8, window=4).collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "shared substring must yield a shared fingerprint"
    assert len(fps[2]) > 0


def test_fingerprint_overlap_pairs_and_df_cap(spark):
    boiler = "all rights reserved by the example corporation of example"
    rows = [(i, f"doc number {i} unique words {i * 17} " + boiler) for i in range(6)]
    rows += [(10, "first twin document with many common words in sequence"),
             (11, "first twin document with many common words in sequence plus"),
             (12, "totally disjoint content nothing matching anywhere else here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["shared_fps"]
             for r in D.fingerprint_overlap_pairs(df, min_shared=2).collect()}
    assert (10, 11) in pairs
    assert not any(12 in p for p in pairs)
    # boilerplate cap: prints present in all 6 boiler docs (df=6) are
    # excluded from pair generation at max_fp_df=2, killing those pairs
    capped = {(r["id_a"], r["id_b"]) for r in D.fingerprint_overlap_pairs(
        df, min_shared=2, max_fp_df=2).collect()}
    assert (10, 11) in capped
    assert not any(a < 6 and b < 6 for a, b in capped)


def test_hash_neardup_pairs_equals_brute_force(spark):
    """Image-payload phash dedup: banded candidates + exact verify must
    equal all-pairs hamming over a pseudo-random 64-bit hash column
    with planted single/triple-bit flips."""
    rng = np.random.default_rng(7)
    hashes = rng.integers(-(1 << 63), 1 << 63, size=120, dtype=np.int64)
    hashes[40] = hashes[39] ^ np.int64(1 << 17)            # hamming 1
    hashes[80] = hashes[79] ^ np.int64((1 << 3) | (1 << 40) | np.int64(1 << 62))
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "image_id long, phash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in D.hash_neardup_pairs(df, max_hamming=3).collect()}
    want = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin((int(hashes[i]) ^ int(hashes[j])) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want
    assert got[(39, 40)] == 1 and got[(79, 80)] == 3


def test_hash_neardup_band_df_cap(spark):
    """Hot-bucket guard: a degenerate hash value shared by many rows
    (the all-zero phash of decode failures) stops generating pairs once
    its buckets exceed max_band_df; near-dups agreeing on rare bands
    survive the cap."""
    rng = np.random.default_rng(11)
    hashes = list(rng.integers(-(1 << 63), 1 << 63, size=40, dtype=np.int64))
    hashes[20] = hashes[19] ^ np.int64(1 << 9)     # rare-band near-dup
    hashes += [np.int64(0)] * 12                   # hot degenerate value
    df = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "image_id long, phash long")
    capped = {(r["id_a"], r["id_b"])
              for r in D.hash_neardup_pairs(df, max_hamming=3,
                                            max_band_df=5).collect()}
    assert (19, 20) in capped
    # the 12 identical zero-hashes pair only through hot buckets
    assert not any(a >= 40 and b >= 40 for a, b in capped)
    # uncapped keeps the full C(12,2) zero-hash clique
    full = {(r["id_a"], r["id_b"])
            for r in D.hash_neardup_pairs(df, max_hamming=3).collect()}
    assert sum(1 for a, b in full if a >= 40 and b >= 40) == 66


def test_minhash_lsh_max_band_df_cap(spark):
    """The new max_band_df knob on minhash_lsh_pairs (plans/neardup.py
    wiring): a corpus of identical docs makes every band bucket hold
    all n rows — capped, candidate generation drops the hot buckets
    and completes with zero pairs; uncapped on a small slice, the
    planted pair set is unchanged by a cap larger than any DF."""
    from urlmap_spark.operators.dedup import minhash_lsh_pairs

    same = spark.createDataFrame(
        [(i, "identical boilerplate text repeated across the corpus")
         for i in range(300)], "doc_id long, text string")
    capped = minhash_lsh_pairs(same, num_hashes=32, bands=8,
                               threshold=0.5, max_band_df=16).count()
    assert capped == 0  # every bucket df=300 > 16 -> dropped

    mixed = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words nothing shared here at all")],
        "doc_id long, text string")
    exact = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(mixed, num_hashes=32, bands=8,
                               threshold=0.5).collect()}
    loose = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(mixed, num_hashes=32, bands=8,
                               threshold=0.5, max_band_df=100).collect()}
    assert (0, 1) in exact and loose == exact
