"""The iterative BFS crawl driver — one Spark job per round.

Reimplements the reference's sequential BFS semantics
(reference: internal/crawler/crawler.go:168-276) as synchronous
DataFrame supersteps (SURVEY.md §3.4):

    frontier(d) --depth gate--> --politeness--> --robots gate-->
      --fetch-join corpus--> results(d)
      --outlink UDF + posexplode--> --scope filter vs seed-->
      --first-wins dedup--> --anti-join seen--> frontier(d+1)

Determinism: crawl order is the reference's FIFO enqueue order, rebuilt
as ``order`` = global rank over (parent_order, pos) of each URL's FIRST
discovery. The reference's concurrent mode is nondeterministic
(sync.Map LoadOrStore first-wins, crawler.go:754); our rounds make the
sequential order THE order at any parallelism — tested by running the
same crawl at different core counts.

Scale notes (the 100 TB story):
- the corpus `bytes` column is never referenced by the crawl plan, so
  Catalyst prunes it out of the fetch-join scan entirely;
- the fetch-join and anti-join shuffle on `url`; AQE skew-join splitting
  plus the politeness salting (operators/politeness.py) handle Zipf-hot
  hosts;
- the seen set is only ever used build-side of a left_anti join and is
  re-read from compact parquet deltas — nothing is O(frontier) on the
  driver; driver traffic is one int per partition per round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import urlcore
from ..functions.urlkernel import same_domain_expr, same_path_prefix_expr, status_ok_expr
from ..operators.extract import extract_outlinks
from ..operators.order import first_wins, with_global_order
from ..operators.politeness import schedule_frontier
from ..operators.robots import robots_gate
from ..sources.catalog import RoundCatalog

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("order", T.LongType(), False),
])

RESULT_COLUMNS = ["url", "depth", "order", "status", "ok", "n_links", "round"]


@dataclass
class CrawlConfig:
    max_depth: int = -1                      # -1 = unlimited (reference default)
    same_domain: bool = True                 # hard-coded true in the reference CLI
    same_path_prefix: bool = True            # (cmd/urlmap/main.go:165-166)
    user_agent: str = "urlmap/1.0"
    robots_rules: DataFrame | None = None    # parsed rules -> robots gate
    host_quota: DataFrame | None = None      # (host, quota) per-round politeness
    default_quota: int | None = None
    global_cap: int | None = None            # per-round global rate cap
    checkpoint_dir: str | None = None        # None = in-memory (tests)
    max_rounds: int = 10_000
    frontier_partitions: int | None = None


@dataclass
class CrawlRun:
    results: DataFrame
    metrics: list[dict] = field(default_factory=list)
    rounds: int = 0
    seen: DataFrame | None = None


def _empty_frontier(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], FRONTIER_SCHEMA)


def crawl(
    spark: SparkSession,
    corpus: DataFrame,
    seed_url: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
) -> CrawlRun:
    cfg = cfg or CrawlConfig()
    if not urlcore.is_valid_url(seed_url):
        raise ValueError(f"invalid start URL: {seed_url}")
    seed = urlcore.normalize_url(seed_url)

    catalog = RoundCatalog(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    # The crawl plan never touches `bytes`; select the narrow columns
    # explicitly so even a cache() stays slim.
    web = corpus.select("url", "caption", "status")

    metrics: list[dict] = []
    results_parts: list[DataFrame] = []

    if resume and catalog is not None and catalog.last_round() is not None:
        last = catalog.last_round()
        frontier = catalog.read(spark, last, "next_frontier")
        seen = catalog.read_union(spark, "seen_delta", upto=last).select("url") \
            .unionByName(spark.createDataFrame([(seed,)], "url string"))
        m = catalog.read_metrics(last)
        order_counter = int(m["order_counter"])
        round_idx = last + 1
        metrics = [catalog.read_metrics(r) for r in catalog.committed_rounds()]
    else:
        frontier = spark.createDataFrame([(seed, 0, 0)], FRONTIER_SCHEMA)
        seen = frontier.select("url")
        order_counter = 1
        round_idx = 0

    seen = seen.persist()
    total_skipped = 0

    while round_idx < cfg.max_rounds:
        t0 = time.time()
        frontier = frontier.persist()
        n_frontier = frontier.count()
        if n_frontier == 0:
            frontier.unpersist()
            break

        # --- dequeue-time depth gate (reference: crawler.go:207-211) -----
        if cfg.max_depth >= 0:
            process = frontier.filter(F.col("depth") <= cfg.max_depth)
            n_process = process.count()
            skipped_depth = n_frontier - n_process
            if n_process == 0:
                metrics.append({
                    "round": round_idx, "frontier": n_frontier, "processed": 0,
                    "crawled": 0, "failed": 0, "skipped_depth": skipped_depth,
                    "blocked_robots": 0, "new_discovered": 0, "max_depth": 0,
                    "order_counter": order_counter, "wall_s": round(time.time() - t0, 3),
                })
                total_skipped += skipped_depth
                frontier.unpersist()
                break
        else:
            process, skipped_depth = frontier, 0

        # --- politeness schedule (quota overflow re-queues, never drops) --
        if cfg.host_quota is not None or cfg.default_quota is not None or cfg.global_cap is not None:
            sched, deferred = schedule_frontier(
                process, cfg.host_quota, cfg.default_quota, cfg.global_cap)
        else:
            sched, deferred = process, _empty_frontier(spark)

        # --- robots gate (disallowed = skipped, reference: crawler.go:583-600)
        if cfg.robots_rules is not None:
            gated = robots_gate(sched, cfg.robots_rules)
            allowed = gated.filter(F.col("robots_allowed")).drop("robots_allowed")
            blocked_robots = gated.filter(~F.col("robots_allowed")).count()
        else:
            allowed, blocked_robots = sched, 0

        # --- fetch = join against the corpus (reference: client.Get ->
        #     crawler.go:331-334 status window; misses stay as failed rows)
        fetched = (
            allowed.join(web, "url", "left")
            .withColumn("ok", F.coalesce(status_ok_expr(F.col("status")), F.lit(False)))
            .withColumn("status", F.coalesce(F.col("status"), F.lit(0)))
        ).persist()

        # --- outlink extraction on OK pages only (crawler.go:644) ---------
        links = extract_outlinks(
            fetched.filter(F.col("ok")).select("url", "depth", "order", "caption")
        ).select(
            F.col("outlink"),
            F.col("order").alias("parent_order"),
            F.col("pos"),
            (F.col("depth") + 1).alias("depth"),
            F.col("url").alias("parent"),
        )

        # --- scope filter vs the normalized seed (crawler.go:233-249) -----
        if cfg.same_domain:
            scope = (
                same_path_prefix_expr(F.lit(seed), F.col("outlink"))
                if cfg.same_path_prefix
                else same_domain_expr(F.lit(seed), F.col("outlink"))
            )
            links = links.filter(F.coalesce(scope, F.lit(False)))

        # --- first-wins intra-round dedup + anti-join the seen set --------
        new = first_wins(
            links.select(F.col("outlink").alias("url"), "parent_order", "pos", "depth"),
            "url", ["parent_order", "pos"],
        ).join(seen, "url", "left_anti")

        # --- assign global crawl order (FIFO enqueue order) ---------------
        new_frontier, order_counter = with_global_order(
            new, ["parent_order", "pos"], order_col="order", start=order_counter,
            num_partitions=cfg.frontier_partitions,
        )
        new_frontier = new_frontier.select("url", "depth", "order").persist()
        n_new = new_frontier.count()

        next_frontier = new_frontier.unionByName(deferred.select("url", "depth", "order"))

        # --- per-round results + metrics ----------------------------------
        results_r = fetched.select(
            "url", "depth", "order", "status", "ok",
            F.lit(round_idx).alias("round"),
        ).withColumn("n_links", F.lit(None).cast("int")).select(*RESULT_COLUMNS)

        agg = fetched.agg(
            F.count("*").alias("processed"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("crawled"),
            F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failed"),
            F.max("depth").alias("max_depth"),
        ).collect()[0]

        m = {
            "round": round_idx,
            "frontier": n_frontier,
            "processed": int(agg["processed"] or 0),
            "crawled": int(agg["crawled"] or 0),
            "failed": int(agg["failed"] or 0),
            "skipped_depth": skipped_depth,
            "blocked_robots": int(blocked_robots),
            "new_discovered": n_new,
            "max_depth": int(agg["max_depth"] or 0),
            "order_counter": order_counter,
            "wall_s": round(time.time() - t0, 3),
        }
        total_skipped += skipped_depth + int(blocked_robots)

        if catalog is not None:
            lineage = new_frontier.groupBy(
                F.expr("try_parse_url(url, 'HOST')").alias("host")
            ).agg(F.count("*").alias("n"), F.min("order").alias("min_order"),
                  F.max("order").alias("max_order"))
            catalog.commit_round(round_idx, {
                "results": results_r,
                "next_frontier": next_frontier,
                "seen_delta": new_frontier.select("url"),
                "lineage": lineage,
            }, m)
            # re-read from storage: truncates lineage, snapshot-isolated
            frontier.unpersist()
            fetched.unpersist()
            new_frontier.unpersist()
            frontier = catalog.read(spark, round_idx, "next_frontier")
            seen = catalog.read_union(spark, "seen_delta", upto=round_idx) \
                .select("url").unionByName(spark.createDataFrame([(seed,)], "url string"))
        else:
            # truncate lineage every round: without this the logical plan
            # nests one fetch-join+window+anti-join PER ROUND and the
            # driver OOMs on plan compilation long before data size matters
            results_parts.append(results_r.localCheckpoint(eager=True))
            old_seen = seen
            seen = seen.unionByName(new_frontier.select("url")).localCheckpoint(eager=True)
            old_seen.unpersist()
            next_frontier = next_frontier.localCheckpoint(eager=True)
            frontier.unpersist()
            fetched.unpersist()
            new_frontier.unpersist()
            frontier = next_frontier

        metrics.append(m)
        round_idx += 1

    if catalog is not None:
        results = catalog.read_union(spark, "results")
        seen_df = catalog.read_union(spark, "seen_delta").select("url") \
            .unionByName(spark.createDataFrame([(seed,)], "url string"))
    else:
        results = results_parts[0] if results_parts else spark.createDataFrame([], T.StructType(
            [T.StructField(c, T.StringType()) for c in RESULT_COLUMNS]))
        for p in results_parts[1:]:
            results = results.unionByName(p)
        seen_df = seen

    return CrawlRun(results=results, metrics=metrics, rounds=round_idx, seen=seen_df)
