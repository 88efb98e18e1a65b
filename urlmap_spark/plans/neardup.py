"""Plan-level near-dup pair generation: the scale-safe form BY DEFAULT.

The pair generators in operators/dedup.py keep exact (uncapped)
defaults so their outputs stay bit-for-bit oracle-checkable — but at
the 100 TB design point every one of them has a quadratic bucket
family (shingles, LSH bands, pigeonhole bands, winnow fingerprints,
sign-blocks) that a degenerate key population turns hostile: the
all-zero phash of decode failures, corpus-wide licence boilerplate, a
hot shingle. VERDICT r4 #4: a caller composing the curation plan
should get the guard WITHOUT remembering to size it.

This module is that entry point. ``neardup_pairs`` measures the corpus
once (one count), sizes the document-frequency cap from it
(sqrt(n), floored — a key shared by <= sqrt(n) docs bounds total
candidate work to O(n) pairs per band family), LOGS the decision, and
dispatches to the right operator with the cap wired in. Operators keep
exact defaults; plans cap by default — callers who need the exact set
call the operator directly.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import DataFrame

from ..operators import dedup as D

__all__ = ["neardup_pairs", "default_df_cap"]

_LOG = logging.getLogger("urlmap_spark.plans.neardup")

METHODS = ("ngram", "minhash", "simhash", "phash", "embedding", "winnow")


def default_df_cap(n_docs: int, floor: int = 64) -> int:
    """Document-frequency cap sized from corpus stats: sqrt(n) (floored
    at `floor` so tiny corpora are never capped below their own size).
    With every bucket bounded to k <= sqrt(n) members, a band family's
    total candidate volume is sum(k_i^2/2) <= n/2 * sqrt(n) in the
    adversarial case and O(n) for realistic key distributions — linear
    scan territory, not a quadratic blowup."""
    return max(floor, math.isqrt(max(int(n_docs), 1)))


def neardup_pairs(
    docs: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_col: str = "phash",
    vec_col: str = "embedding",
    cap: int | None = None,
    n_docs: int | None = None,
    **kw,
) -> DataFrame:
    """(id_a, id_b, ...) candidate near-dup pairs for `docs`, capped by
    default. Extra kwargs pass through to the underlying operator
    (thresholds, band counts, hash_expr, ...).

    - cap: explicit document-frequency cap; None sizes it from the
      corpus (default_df_cap). Pass the operator's own uncapped form
      directly if you need the exact pair set.
    - n_docs: corpus size if the caller already knows it (skips the
      count job).

    method:
      ngram      ngram_jaccard_pairs   (cap -> max_shingle_df)
      minhash    minhash_lsh_pairs     (cap -> max_band_df)
      simhash    simhash_pairs         (cap -> max_band_df)
      phash      hash_neardup_pairs    (cap -> max_band_df; hash_col)
      winnow     fingerprint_overlap_pairs (cap -> max_fp_df)
      embedding  embedding_neardup_pairs over a sign-block column sized
                 so the average block holds <= cap vectors
    """
    if method not in METHODS:
        raise ValueError(f"unknown near-dup method {method!r}; "
                         f"one of {METHODS}")
    if n_docs is None:
        n_docs = docs.count()
    if cap is None:
        cap = default_df_cap(n_docs)
    _LOG.info("neardup_pairs method=%s n_docs=%d df_cap=%d", method,
              n_docs, cap)

    if method == "ngram":
        return D.ngram_jaccard_pairs(docs, id_col=id_col, text_col=text_col,
                                     max_shingle_df=cap, **kw)
    if method == "minhash":
        return D.minhash_lsh_pairs(docs, id_col=id_col, text_col=text_col,
                                   max_band_df=cap, **kw)
    if method == "simhash":
        return D.simhash_pairs(docs, id_col=id_col, text_col=text_col,
                               max_band_df=cap, **kw)
    if method == "phash":
        return D.hash_neardup_pairs(docs, id_col=id_col, hash_col=hash_col,
                                    max_band_df=cap, **kw)
    if method == "winnow":
        return D.fingerprint_overlap_pairs(docs, id_col=id_col,
                                           text_col=text_col,
                                           max_fp_df=cap, **kw)
    # embedding: no per-key DF cap exists (keys are continuous vectors)
    # — the guard is the block granularity instead: pick enough sign
    # bits that the AVERAGE block holds <= cap vectors, so the
    # within-block join is bounded the same way a capped bucket is
    from ..operators.similarity import sign_block

    dim_row = docs.select(vec_col).first()
    dim = len(dim_row[0]) if dim_row and dim_row[0] is not None else 0
    n_bits = min(max(dim, 1) if dim else 1, 16,
                 max(1, math.ceil(math.log2(max(n_docs / cap, 2)))))
    _LOG.info("neardup_pairs embedding sign-block bits=%d", n_bits)
    blocked = sign_block(docs, dims=list(range(n_bits)), vec_col=vec_col)
    return D.embedding_neardup_pairs(blocked, id_col=id_col, vec_col=vec_col,
                                     block_col="blk", **kw)
