"""Host-graph construction + PageRank frontier prioritization.

The reference schedules FIFO (its job queue is a buffered channel,
internal/crawler/crawler.go:446); it has no link-graph analytics. At a
10^10-URL frontier a crawler schedules by authority signals, and
PageRank over the *host* graph is the classic one (Page et al. 1999;
Cho & Garcia-Molina's crawl-ordering study) — host granularity keeps
the rank table small enough to broadcast back into the frontier as a
priority column (`politeness.priority_schedule` consumes any numeric
priority).

Shapes, 100 TB notes:

- ``host_edges``: one shuffle (groupBy src_host, dst_host) over the
  extracted-links table; hosts come from the same ``host_expr`` kernel
  the crawl uses, so edge identity matches URL-seen identity.
- ``pagerank`` / ``pagerank_int``: synchronous supersteps, ONE shuffle
  per iteration — the groupBy(dst) contribution sum. The rank table is
  host-granularity (bounded by design — that is why the graph is built
  per host, not per URL), so it is explicitly ``broadcast()`` into the
  edge join each superstep: the big edge table never re-shuffles, the
  per-edge contribution is computed map-side, and the node left-join
  that re-attaches no-in-edge hosts broadcasts the aggregated
  contributions (localCheckpoint'd frames carry no Catalyst stats, so
  without the hints both joins would fall to corpus-wide SMJs — same
  gotcha as attach_components). The out-weight table is computed once
  and reused; each iteration's frame is localCheckpoint'd so the plan
  does not grow with the iteration count (components.py pattern).
  Nothing driver-side except the bounded node count (hosts, not URLs).
- ``pagerank_int`` is the value-checkable twin: fixed-point int64
  arithmetic where every per-edge contribution is the SAME floor
  division in Spark (`div`) and ANSI SQL (DuckDB `//` — both truncate
  on non-negative longs), so the shuffled per-node sum is an integer
  sum — order-independent — and results hash-match an oracle
  bit-for-bit. The float path's shuffled doubles cannot promise that,
  which is exactly the repo's established arith-twin pattern
  (dedup-minhash-arith, quality-classifier-arith, ...).

Dangling mass: hosts with no out-edges contribute nothing (their mass
leaks, as in the original formulation without the dangling patch).
Both engines implement the identical rule, and the docstring states it
so callers ranking a frontier know ranks sum to <= 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urlmap_spark.functions.urlkernel import host_expr

__all__ = ["host_edges", "pagerank", "pagerank_int", "priority_expr_from_ranks"]


def host_edges(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Weighted host->host edge list from a (src_url, dst_url) link
    table: ``(src_host, dst_host, cnt)``, self-loops kept (a same-host
    link is real crawl signal; PageRank handles them fine).

    Hosts are extracted with the crawl kernel's ``host_expr`` (port
    stripped, reference: internal/url/url.go:42-63) and lowercased so
    edge identity matches URL-seen identity. Rows whose either side has
    no parseable host are dropped.
    """

    def _h(c: Column) -> Column:
        return F.lower(host_expr(c))

    return (
        links.select(_h(F.col(src_col)).alias("src_host"),
                     _h(F.col(dst_col)).alias("dst_host"))
        .where(F.col("src_host").isNotNull() & (F.col("src_host") != "")
               & F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _nodes(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("host"))
        .union(edges.select(F.col(dst).alias("host")))
        .distinct()
    )


def _prep(edges: DataFrame, src: str, dst: str, key_encoding: str = "auto"):
    """Shared superstep prep: the materialized (host, _id) node table
    and the edge frame re-keyed to int64 node ids.

    String keys in a bandwidth-bound scan+agg are the classic cost —
    measured 2.5x on a 10^7-edge graph — so supersteps run on
    ``xxhash64(host)`` ids and host strings are joined back once at the
    end. The id map is verified bijective on the BOUNDED node table
    (one count): on the astronomically-unlikely collision the frame
    falls back to string keys, trading speed for exactness, never
    silently merging hosts. ``key_encoding="string"`` forces that
    fallback path (it exists so the fallback is testable — results
    must be identical either way). Returns (nodes, n, edge_frame,
    use_ids); edge_frame carries (_src, _dst) as ids (or strings on
    fallback)."""
    if key_encoding not in ("auto", "string"):
        raise ValueError("key_encoding must be 'auto' or 'string'")
    nodes = (_nodes(edges, src, dst)
             .withColumn("_id", F.xxhash64("host")).localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes, 0, None, False
    use_ids = (key_encoding == "auto"
               and nodes.select("_id").distinct().count() == n)
    if use_ids:
        e = edges.select(F.xxhash64(F.col(src)).alias("_src"),
                         F.xxhash64(F.col(dst)).alias("_dst"), "*")
    else:
        e = edges.select(F.col(src).alias("_src"),
                         F.col(dst).alias("_dst"), "*")
    return nodes, n, e, use_ids


def _iter_nodes(nodes: DataFrame, use_ids: bool) -> DataFrame:
    key = F.col("_id") if use_ids else F.col("host")
    return nodes.select(key.alias("nid"))


def _decode(ranks: DataFrame, nodes: DataFrame, use_ids: bool,
            rank_col: str) -> DataFrame:
    if not use_ids:
        return ranks.select(F.col("nid").alias("host"), rank_col)
    return (
        ranks.join(F.broadcast(nodes), ranks.nid == nodes._id)
        .select("host", rank_col)
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "cnt",
    key_encoding: str = "auto",
) -> DataFrame:
    """Weighted PageRank over ``edges`` -> ``(host, rank)`` (double).

    rank'(v) = (1-d)/n + d * sum over in-edges (u,v) of
               rank(u) * w(u,v) / out_w(u)

    Fixed ``iters`` synchronous supersteps; one shuffle per iteration
    (the groupBy(dst) sum). Dangling hosts leak mass (see module doc).
    The node count is the one driver-side scalar (bounded: hosts).
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    nodes, n, e, use_ids = _prep(edges, src, dst, key_encoding)
    if n == 0:
        return nodes.select("host").withColumn("rank", F.lit(0.0))
    niter = _iter_nodes(nodes, use_ids)
    out_w = e.groupBy("_src").agg(F.sum(weight).alias("_out_w"))
    ew = (
        e.join(F.broadcast(out_w), "_src")
        .select("_src", "_dst",
                (F.col(weight).cast("double") / F.col("_out_w")).alias("_share"))
        .localCheckpoint()
    )
    ranks = niter.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(iters):
        contrib = (
            ew.join(F.broadcast(ranks), ew._src == ranks.nid)
            .select(F.col("_dst").alias("nid"),
                    (F.col("rank") * F.lit(damping) * F.col("_share")).alias("_c"))
            .groupBy("nid").agg(F.sum("_c").alias("_in"))
        )
        ranks = niter.join(F.broadcast(contrib), "nid", "left").select(
            "nid", (F.lit(base) + F.coalesce(F.col("_in"), F.lit(0.0))).alias("rank"))
        if i < iters - 1:  # the returned frame keeps its superstep plan
            # LAZY checkpoint (r5-10 fixed-cost attribution): the plan is
            # truncated either way, but eager forced one driver-blocking
            # materialization job per superstep at build time — lazy lets
            # the next superstep's broadcast build double as the
            # materialization, removing ~1 job of scheduling fixed cost
            # per iteration (measured in OPTIMIZATION_r06.md)
            ranks = ranks.localCheckpoint(eager=False)
    return _decode(ranks, nodes, use_ids, "rank")


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10**9,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "cnt",
    key_encoding: str = "auto",
) -> DataFrame:
    """Fixed-point PageRank twin -> ``(host, rank_int)`` (bigint),
    value-checkable against an ANSI-SQL oracle bit-for-bit.

    rank0    = scale div n
    contrib  = (rank * damping_num * w) div (damping_den * out_w)   per edge
    rank'(v) = ((damping_den - damping_num) * scale) div (damping_den * n)
               + sum(contrib over in-edges of v)

    Every division is floor division on non-negative int64 (Spark
    ``div`` == DuckDB ``//`` there), and the only aggregation is an
    integer sum — order-independent, so the shuffled result is exact.
    Overflow bound: rank <= scale and the per-edge numerator is
    rank * damping_num * w — keep scale * damping_num * max_weight
    under 2^63 (the defaults leave room for per-edge weights up to
    ~5*10^8).
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")
    nodes, n, e, use_ids = _prep(edges, src, dst, key_encoding)
    if n == 0:
        return nodes.select("host").withColumn("rank_int", F.lit(0).cast("long"))
    niter = _iter_nodes(nodes, use_ids)
    out_w = e.groupBy("_src").agg(F.sum(weight).cast("long").alias("_out_w"))
    ew = (
        e.join(F.broadcast(out_w), "_src")
        .select("_src", "_dst", F.col(weight).cast("long").alias("_w"), "_out_w")
        .localCheckpoint()
    )
    dn, dd = int(damping_num), int(damping_den)
    base = ((dd - dn) * int(scale)) // (dd * n)
    ranks = niter.withColumn("rank_int", F.lit(int(scale) // n).cast("long"))
    for i in range(iters):
        contrib = (
            ew.join(F.broadcast(ranks), ew._src == ranks.nid)
            .select(
                F.col("_dst").alias("nid"),
                F.expr(f"(rank_int * {dn}L * _w) div ({dd}L * _out_w)").alias("_c"),
            )
            .groupBy("nid").agg(F.sum("_c").alias("_in"))
        )
        ranks = niter.join(F.broadcast(contrib), "nid", "left").select(
            "nid",
            (F.lit(base).cast("long")
             + F.coalesce(F.col("_in"), F.lit(0).cast("long"))).alias("rank_int"))
        if i < iters - 1:  # the returned frame keeps its superstep plan
            # lazy for the same per-superstep fixed-cost reason as the
            # float path above
            ranks = ranks.localCheckpoint(eager=False)
    return _decode(ranks, nodes, use_ids, "rank_int")


# SQL twin of urlkernel.host_expr (try_parse_url HOST, port stripped,
# lowercased) — priority_expr is a string evaluated over the frontier,
# so the host extraction must ride inside it.
_HOST_SQL = r"lower(regexp_replace(try_parse_url(trim(url), 'HOST'), ':[0-9]+$', ''))"


def priority_expr_from_ranks(
    ranks: DataFrame,
    rank_col: str = "rank_int",
    max_hosts: int = 50_000,
) -> str:
    """Bridge a (host, rank) table into a ``CrawlConfig.priority_expr``
    string: a literal-map lookup keyed by the frontier URL's host, so a
    PageRank (or any authority score) drives which frontier rows win
    the politeness budget each round.

    ``element_at(map(...), host)`` yields NULL for unknown hosts, and
    the scheduler ranks NULL priority LOWEST (plans/crawl.py
    priority_expr contract) — so hosts outside the rank table defer
    behind ranked ones, never ahead. Crawl semantics stay
    delay-never-drop: the URL-seen set is priority-invariant.

    Scale bound: the rank table is collected and inlined as literals —
    the same bounded-literal pattern as the classifier's literal
    weights array (classify.py). Host-granularity ranks are small by
    design; past ``max_hosts`` (or if a hostname needs escaping) this
    raises, and the scale path is a broadcast (host, priority) join
    attached to the frontier before the crawl (see MODELS.md's
    literal-vs-table discussion for the classifier — same trade).
    """
    rows = ranks.select(F.col("host"), F.col(rank_col)).collect()
    if len(rows) > max_hosts:
        raise ValueError(
            f"rank table has {len(rows)} hosts > max_hosts={max_hosts}; "
            "join ranks onto the frontier as a broadcast priority table "
            "instead of inlining literals")
    if not rows:
        return "CAST(NULL AS BIGINT)"
    entries = []
    for r in rows:
        h = r["host"]
        v = r[rank_col]
        if h is None or "'" in h or "\\" in h:
            raise ValueError(f"hostname not inlinable as a SQL literal: {h!r}")
        if v is None or not isinstance(v, (int, float)):
            # a NULL/odd-typed rank would otherwise surface as a bare
            # TypeError from int(None) or be silently repr'd into SQL
            raise ValueError(
                f"rank for host {h!r} is not a non-null number: {v!r}")
        entries.append(f"'{h}'")
        entries.append(f"{int(v)}L" if isinstance(v, int) else repr(float(v)))
    return f"element_at(map({', '.join(entries)}), {_HOST_SQL})"
