"""Text analysis for training-data pipelines — all JVM-native expressions.

Language-ID (stopword-marker heuristic), quality scoring, token
counting, and document fingerprinting over a `text` column. Everything
here is built from pyspark.sql.functions only (no Python in the hot
path) and has an exact DuckDB-SQL twin in __spark_entry__.oracle_sql,
so the driver's oracle verifies each one value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic marker sets (heuristic language ID; a real system
# would use char-n-gram profiles — the Spark shape is identical)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "una"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on"]

# BPE-ish tokenizer: words, numbers, or single punctuation marks
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens (empty trailing element of split removed)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    """Count of non-empty whitespace-separated tokens. regexp_count of
    non-whitespace RUNS equals size(filter(split(\\s+), != '')) for every
    string (Java \\S is the exact complement of the split's \\s), without
    materializing the token array just to count it (guide §4.2 —
    measured on the sf1.0 token-count query in OPTIMIZATION_r06.md)."""
    return F.regexp_count(text, F.lit(r"\S+"))


def bpe_token_count_expr(text: Column) -> Column:
    """Sub-word-ish token count via the regex tokenizer (regexp_count:
    same value as size(regexp_extract_all(...)), no match-array alloc)."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def marker_hits_expr(text: Column, markers: list[str]) -> Column:
    toks = tokens_expr(F.lower(text))
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def langid_expr(text: Column) -> Column:
    """argmax over marker-hit counts; 'und' when no marker fires.
    Deterministic tie-break: en > de > es.

    ONE aggregate pass: higher-order functions are interpreted and get
    no common-subexpression elimination, so the pre-r6 form (one
    split+filter per language, plus the argmax CASE referencing each
    score twice) re-tokenized every document ~10x. Here the lower+split
    runs once and a single fold counts all languages at once — the
    three counters are packed into one 64-bit accumulator (21 bits
    each; marker sets are disjoint, and a document would need 2^21
    tokens of one marker to overflow — far beyond any bounded-length
    corpus row). The finish lambda unpacks and applies the identical
    argmax/tie-break, so emitted labels are unchanged (oracle-checked).
    """
    langs = list(LANG_MARKERS)
    arrs = [F.array(*[F.lit(m) for m in LANG_MARKERS[lang]]) for lang in langs]
    shifts = [1 << (21 * (len(langs) - 1 - i)) for i in range(len(langs))]

    def step(acc, t):
        e = F.lit(0).cast("long")
        for arr, sh in zip(arrs, shifts):
            e = F.when(F.array_contains(arr, t), F.lit(sh).cast("long")).otherwise(e)
        return acc + e

    def finish(acc):
        scores = [
            F.shiftrightunsigned(acc, 21 * (len(langs) - 1 - i)).bitwiseAND(F.lit((1 << 21) - 1))
            for i in range(len(langs))
        ]
        best = F.greatest(*scores)
        out = F.lit("und")
        for lang, sc in reversed(list(zip(langs, scores))):
            out = F.when((best > 0) & (sc == best), F.lit(lang)).otherwise(out)
        return out

    agg = F.aggregate(F.split(F.lower(text), r"\s+"),
                      F.lit(0).cast("long"), step, finish)
    # null text: the pre-r6 CASE chain fell through to 'und' (null
    # scores never satisfy a WHEN) — aggregate propagates null instead,
    # so restore the contract here
    return F.coalesce(agg, F.lit("und"))


def quality_score_expr(text: Column) -> Column:
    """Length/stopword/punctuation composite in [0,1] — the standard
    cheap quality gate for web-scale corpus filtering. Expressible in
    ANSI SQL (oracle-checked).

    Token and stopword counts come from ONE aggregate pass over a
    single lower+split (token count is case/whitespace-invariant, so
    counting on the lowered split is exact), packed into one long
    (n_tokens<<21 | n_stop). The arithmetic in the finish lambda is
    term-for-term identical to the pre-r6 form — same operand types,
    same operation order — so the rounded double is bit-identical
    (driver hash-checked)."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_chars = F.length(text)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))

    def step(acc, t):
        return acc + F.when(
            t == "", F.lit(0).cast("long")
        ).otherwise(
            F.when(F.array_contains(stop_arr, t),
                   F.lit((1 << 21) + 1).cast("long"))
            .otherwise(F.lit(1 << 21).cast("long")))

    def finish(acc):
        n_tokens = F.shiftrightunsigned(acc, 21)
        n_stop = acc.bitwiseAND(F.lit((1 << 21) - 1))
        len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
        stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
        punct_penalty = F.when(
            n_chars > 0, F.least(n_punct * F.lit(5.0) / n_chars, F.lit(1.0))
        ).otherwise(F.lit(0.0))
        return F.round(
            F.lit(0.5) * len_score + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
            - F.lit(0.3) * punct_penalty + F.lit(0.3),
            6,
        )

    return F.aggregate(F.split(F.lower(text), r"\s+"),
                       F.lit(0).cast("long"), step, finish)


def fingerprint_expr(text: Column, bits: int = 64) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 — JVM-side).
    The md5-prefix variant below is the oracle-checked twin (DuckDB has
    md5 but not xxhash64)."""
    return F.xxhash64(text)


def fingerprint_md5_expr(text: Column) -> Column:
    return F.substring(F.md5(text), 1, 16)


def winnow_grams_expr(text: Column, k: int = 8, hash_expr=None) -> Column:
    """Hashes of every character k-gram of lower(text) — step 1 of
    winnowing fingerprints (the MOSS scheme, Schleimer/Wilkerson/Aiken
    SIGMOD'03). Texts shorter than k clamp to one whole-text gram
    (substring clamps), same convention as shingles_expr. Default gram
    hash is xxhash64; pass `hash_expr=lambda g:
    dedup.arith_hash_expr(g, ...)` for the ANSI-SQL-recomputable twin
    the DuckDB oracle verifies.

    Kept SEPARATE from the window-minima step on purpose: interpreted
    higher-order functions get no common-subexpression elimination, so
    nesting this inside the minima transform would re-hash the whole
    gram array once per window (quadratic — the same pitfall
    documented on shingles_expr). Materialize this as a column, then
    apply winnow_minima_expr to it."""
    gh = hash_expr or (lambda g: F.xxhash64(g))
    t = F.lower(F.coalesce(text, F.lit("")))
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(0), n_grams - 1),
                       lambda i: gh(F.substring(t, i + 1, k)))


def winnow_minima_expr(grams: Column, window: int = 4) -> Column:
    """Step 2: slide a window of `window` consecutive gram hashes over
    a MATERIALIZED gram-hash array column, keep each window's minimum,
    distinct the minima. Any shared substring of length >= k+window-1
    between two documents yields a shared fingerprint while only
    ~2/(window+1) of the grams are kept — the standard fingerprinting
    density/guarantee trade."""
    n_windows = F.greatest(F.size(grams) - (window - 1), F.lit(1))
    return F.array_distinct(F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda j: F.array_min(F.slice(grams, j + 1, window))))


# ---------------------------------------------------------------------------
# Intra-document repetition stats (the Gopher quality-filter family:
# Rae et al. 2021 §A1.1 use duplicate-line/duplicate-n-gram fractions
# to drop degenerately repetitive web text). Whole-stage-codegen-free
# higher-order functions, zero Python; each has an exact DuckDB twin
# (repetition-stats oracle entry). The reference has no corpus ops —
# this is part of the training-data mandate.
# ---------------------------------------------------------------------------


def dup_token_frac_expr(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    (n - n_distinct) / n. 0.0 for empty text."""
    toks = tokens_expr(F.lower(text))
    n = F.size(toks)
    return F.round(
        F.when(n > 0, (n - F.size(F.array_distinct(toks))) / n).otherwise(F.lit(0.0)), 6
    )


def _grams_expr(toks: Column, n: int) -> Column:
    """Word n-grams WITH duplicates (unlike dedup.shingles_expr, which
    distincts — repetition scoring needs the multiplicities). Same
    short-text clamp: < n tokens collapse to one whole-text gram, and
    sequence() never sees a descending range."""
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def top_ngram_frac_expr(text: Column, n: int = 2) -> Column:
    """Fraction of the document's n-grams occupied by its single most
    frequent n-gram — the classic '0.18 of 2-grams in one bigram'
    repetition signal. Count per distinct gram is an array filter, so
    this is O(distinct_grams x grams) PER DOCUMENT: bounded-length docs
    only (at 100 TB the filter chain runs after token-count bounds, so
    the length cap upstream bounds this too)."""
    toks = tokens_expr(F.lower(text))
    grams = _grams_expr(toks, n)
    counts = F.transform(
        F.array_distinct(grams), lambda g: F.size(F.filter(grams, lambda x: x == g))
    )
    return F.round(F.array_max(counts) / F.size(grams), 6)


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction of emails / IPv4 / phone numbers) —
# the standard pre-training privacy pass. Patterns are deliberately
# RE2-compatible (no backrefs/lookaround) so the DuckDB oracle runs
# the IDENTICAL regex; Spark's regexp_replace replaces all matches,
# DuckDB needs the 'g' flag. Scrub order is fixed email -> ip -> phone
# so earlier redactions cannot create later false matches (the counts
# are all taken on the ORIGINAL text).
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}-\d{4}"


def pii_count_expr(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def pii_scrub_expr(text: Column) -> Column:
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
