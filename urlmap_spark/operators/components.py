"""Connected components + canonical-document selection over near-dup
pair graphs — the step that turns this engine's near-dup PAIR outputs
(minhash/simhash/ngram/phash/embedding, operators/dedup.py) into the
dedup GROUPS a training-data pipeline actually consumes: one keeper per
duplicate cluster, every other member flagged.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC'14). Chosen over plain min-label propagation because
its round count is O(log^2 n) in the WORST case independent of
component diameter — a pathological duplicate chain (doc_i ~ doc_{i+1})
costs label propagation O(n) rounds but this algorithm O(log n)-ish.
Per iteration: two groupBy shuffles keyed on a single node id plus a
distinct — every shuffled row is two ids (16 bytes for bigint nodes),
never document content. Driver holds only per-iteration counts; edge
frames are localCheckpoint'd so the iterative plan does not grow.

Skew note for 100 TB: a mega-cluster (e.g. boilerplate duplicated
10^8 times) concentrates its component-min on one reduce key in the
small-star groupBy. The aggregate is min() — partial (map-side)
aggregation absorbs the skew before the exchange, so no salting is
required (unlike joins, where AQE skew-split covers the residual).

The reference has no graph stage (it is a crawler); this module exists
for the training-data-pipeline mandate, same as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "attach_components",
    "canonical_docs",
]


def _canonical_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Distinct undirected edges as (a, b), self-loops dropped. Node
    type is whatever the caller's id type is — the algorithm only needs
    a total order (bigint and string both work)."""
    return (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: for every node u, connect each strictly-larger
    neighbor v to m = min(N(u) ∪ {u}). Emitted edges (v, m) always have
    v > m, so no self-loops can appear."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_nmin"))
        .select("a", F.least(F.col("a"), F.col("_nmin")).alias("_m"))
    )
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient every edge toward its larger endpoint (key u,
    neighbors all < u), then connect each neighbor and u itself to
    m = min(N(u)). m < u always holds, so the (u, m) edge is never a
    self-loop; neighbor edges (v, m) skip v = m explicitly."""
    ori = edges.select(
        F.greatest(F.col("a"), F.col("b")).alias("a"),
        F.least(F.col("a"), F.col("b")).alias("b"),
    )
    mins = ori.groupBy("a").agg(F.min("b").alias("_m"))
    nbr = (
        ori.join(mins, "a")
        .where(F.col("b") != F.col("_m"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
    )
    own = mins.select(F.col("a"), F.col("_m").alias("b"))
    return nbr.union(own).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Labels every node reachable through `pairs` with its component's
    MINIMUM node id: returns (id, component), one row per distinct node
    that appears in at least one non-self-loop pair. Nodes absent from
    `pairs` (singletons) are the caller's to union in — see
    attach_components, which defaults them to their own id.

    Iterates large-star/small-star to the paper's fixpoint (the edge
    set stops changing), at which point the edge set IS the star graph
    (v, component_min) for every non-root v. max_iter is a safety rail
    only — 50 alternations cover any graph these pair generators can
    emit (the paper bounds convergence by O(log^2 n) rounds).
    """
    edges = _canonical_edges(pairs, a_col, b_col).localCheckpoint()
    if not edges.head(1):
        # empty edge set: emit an empty (id, component) frame with the
        # node id's own type on both columns
        return edges.select(F.col("a").alias("id"), F.col("b").alias("component"))

    prev = edges
    prev_n = prev.count()
    converged = False
    for _ in range(max_iter):
        cur = _small_star(_large_star(prev)).localCheckpoint()
        cur_n = cur.count()
        # both frames are distinct edge SETS: equal count + empty
        # one-sided difference <=> set equality
        if cur_n == prev_n and not cur.subtract(prev).head(1):
            prev = cur
            converged = True
            break
        prev, prev_n = cur, cur_n
    if not converged:
        # pre-fixpoint edges are not guaranteed to be stars: labels
        # derived from them can be wrong, so never fail silently
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint after {max_iter} "
            "alternations; labels may be incomplete — raise max_iter",
            stacklevel=2,
        )
    # fixpoint edges are (node, root); roots appear only on the b side
    return (
        prev.select(F.col("a").alias("id"), F.col("b").alias("component"))
        .union(prev.select(F.col("b").alias("id"), F.col("b").alias("component")))
        .distinct()
    )


def attach_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    broadcast_max_rows: int = 4_000_000,
) -> DataFrame:
    """df + a `component` column: the component min for nodes that near-
    dup pairs reach, the node's own id for singletons.

    The labels side is one row per PAIRED node — far smaller than df
    when duplication is sparse — but it hangs off localCheckpoint'd
    iteration output, for which Catalyst has NO size statistics: the
    optimizer defaults it to "huge" and picks a sort-merge join that
    shuffles the whole corpus (observed in the static plan). Labels are
    therefore checkpointed, counted (exact and cheap — one job over the
    materialized frame) and broadcast-HINTED while under
    broadcast_max_rows; above the threshold the sort-merge join is the
    correct plan and stands."""
    labels = connected_components(pairs, a_col=a_col, b_col=b_col).localCheckpoint()
    lab = labels.withColumnRenamed("id", id_col)
    if broadcast_max_rows and labels.count() <= broadcast_max_rows:
        lab = F.broadcast(lab)
    return (
        df.join(lab, id_col, "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    )


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """The dedup verdict: df + (component, keeper_id, is_duplicate).
    Keeper per component = highest `quality_col` (ties -> smallest id),
    or smallest id when no quality column is given. Keeping the best-
    quality member (longest text, highest score, ...) instead of an
    arbitrary one is the standard training-corpus dedup policy.

    The keeper aggregation is a min() over a struct — partial-agg
    friendly, so the mega-component skew note at the top of this module
    applies here too. df columns pass through untouched.
    """
    with_comp = attach_components(df, pairs, id_col=id_col, a_col=a_col, b_col=b_col)
    if quality_col is not None:
        # min(struct(-quality, id)): max quality, then min id on ties.
        # Negation needs a numeric quality column (lengths/scores are).
        # Null quality coalesces to -inf (null = WORST): struct ordering
        # puts a null field first, so min() would otherwise crown a
        # null-quality member keeper over every scored one.
        key = F.struct(
            (-F.coalesce(F.col(quality_col).cast("double"),
                         F.lit(float("-inf")))).alias("_nq"),
            F.col(id_col).alias("_i"),
        )
    else:
        key = F.struct(F.col(id_col).alias("_i"))
    keepers = (
        with_comp.groupBy("component")
        .agg(F.min(key).alias("_k"))
        .select("component", F.col("_k._i").alias("keeper_id"))
    )
    return (
        with_comp.join(keepers, "component")
        .withColumn("is_duplicate", F.col(id_col) != F.col("keeper_id"))
    )
