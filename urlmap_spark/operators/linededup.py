"""Cross-document line-level deduplication (the CCNet / C4 boilerplate
pass): every line is kept only at its GLOBAL first occurrence — ordered
by (doc id, line position) — and later copies, across documents and
within one, are removed from the text. This is the standard web-corpus
treatment for cookie banners / nav bars / license footers that exact
and near-dup DOCUMENT dedup cannot touch. Part of the training-data
mandate — the reference crawler has no corpus ops.

Scale shape (the part that matters at 100 TB):
- The dedup decision never ships line text in hash mode: lines project
  to (xxhash64, id, pos) before any exchange, the first-occurrence
  winner per line is a min(struct(id, pos)) groupBy — map-side
  combinable, so a boilerplate line appearing in 10^9 documents
  reduces to one row per map task before the shuffle — and the
  winner-join back to occurrences spreads hot keys across tasks (AQE
  skew splitting applies; a window row_number per line would funnel
  every copy of the hottest line into one task).
- Text is rewritten WITHOUT shuffling the corpus when the drop set is
  small: per-doc drop positions aggregate to one short array row per
  affected document, and the join back to docs broadcast-hints itself
  under `broadcast_max_docs` (the attach_components lesson: the frame
  hangs off aggregation output with no useful stats). Above the
  threshold it is a plain co-keyed join on id — unavoidable, since the
  text must be rewritten — and the reassembly itself is a native
  filter-with-index + concat_ws, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["remove_duplicate_lines"]


def remove_duplicate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    key: str = "hash",
    broadcast_max_docs: int = 4_000_000,
) -> DataFrame:
    """docs with `text_col` rewritten so each distinct line survives only
    at its first (id, pos) occurrence, plus n_lines (original line
    count) and n_removed. key='hash' (default) dedups on xxhash64(line)
    — the scale path, 8-byte shuffle keys; key='exact' groups on the
    line string itself (what the DuckDB oracle reproduces; pytest pins
    hash == exact). Empty documents pass through: split('') is [''],
    so two empty docs share the '' line and the second rewrites to ''
    — identical text, harmless."""
    if key not in ("hash", "exact"):
        raise ValueError(f"key must be 'hash' or 'exact', got {key!r}")
    id_ = F.col(id_col)
    parts = F.split(F.col(text_col), sep)

    lines = docs.select(
        id_.alias("id"),
        F.posexplode(parts).alias("pos", "line"),
    ).select(
        "id", "pos",
        (F.xxhash64("line") if key == "hash" else F.col("line")).alias("k"),
    )
    winners = lines.groupBy("k").agg(
        F.min(F.struct("id", "pos")).alias("w"))
    drops = (
        lines.join(winners, "k")
        .filter((F.col("id") != F.col("w.id")) | (F.col("pos") != F.col("w.pos")))
        .groupBy("id")
        .agg(F.collect_list("pos").alias("drop_pos"))
        .withColumnRenamed("id", "_ld_id")
    )
    # aggregation output carries no usable stats (the attach_components
    # lesson) — count it ourselves and hint the broadcast while small
    if drops.count() <= broadcast_max_docs:
        drops = broadcast(drops)

    joined = docs.join(drops, id_ == F.col("_ld_id"), "left")
    dp = F.coalesce("drop_pos", F.array().cast("array<int>"))
    kept = F.filter(parts, lambda x, i: ~F.array_contains(dp, i))
    return joined.select(
        *[c for c in docs.columns if c != text_col],
        F.concat_ws(sep, kept).alias(text_col),
        F.size(parts).alias("n_lines"),
        F.size(dp).alias("n_removed"),
    )
