"""End-to-end pipeline composition: the graft's whole point in one
test — CRAWL the web-as-a-table, fetch the crawled pages' captions
(fetch-join), CURATE them (metrics + near-dup verdict), SAMPLE a
training mix, PACK the survivors into token-budget shards. Every stage
is the real operator; the assertions pin cross-stage invariants and
end-to-end determinism under different partitionings."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from urlmap_spark.operators.dedup import ngram_jaccard_pairs
from urlmap_spark.operators.packing import hash_sample, pack_shards
from urlmap_spark.plans.crawl import CrawlConfig, crawl
from urlmap_spark.plans.curate import curate_corpus
from urlmap_spark.sources.corpus import corpus_spark


def _run_pipeline(spark, parts):
    corpus = corpus_spark(spark, seed=7, n_hosts=3, total_pages=90,
                          with_bytes=False, partitions=parts)
    run = crawl(spark, corpus, "https://h0.example-7.test/",
                CrawlConfig(max_depth=3, same_domain=False,
                            same_path_prefix=False,
                            checkpoint_dir=tempfile.mkdtemp()))
    fetched = (run.results.filter(F.col("ok"))
               .join(corpus.select("url", "caption"), "url")
               .select(F.col("order").alias("doc_id"),
                       F.col("caption").alias("text"), "url"))
    pairs = ngram_jaccard_pairs(fetched, threshold=0.3, n=3,
                                max_shingle_df=40).select("id_a", "id_b")
    curated = curate_corpus(fetched, pairs=pairs, allowed_langs=("en", "und"),
                            min_tokens=2, min_quality=0.0)
    kept = curated.filter(F.col("keep"))
    sampled = hash_sample(kept, 0.8, key_col="doc_id")
    packed = pack_shards(sampled, budget=60, sort_cols=("doc_id",))
    return run, fetched, curated, kept, sampled, packed


def test_crawl_curate_sample_pack(spark):
    run, fetched, curated, kept, sampled, packed = _run_pipeline(spark, 4)
    n_fetched = fetched.count()
    assert n_fetched > 10  # the crawl actually reached the site
    # curation covers every fetched doc exactly once
    assert curated.count() == n_fetched
    # near-dup components: no kept doc is a flagged duplicate, and every
    # dropped-as-duplicate doc's keeper exists and is not itself flagged
    dup = curated.filter(F.col("drop_reason") == "duplicate")
    keepers = {r["doc_id"] for r in
               curated.filter(~F.col("is_duplicate")).collect()}
    assert all(r["keeper_id"] in keepers for r in dup.collect())
    # sampling is a subset, packing covers every sampled row
    n_samp = sampled.count()
    assert 0 < n_samp <= kept.count()
    assert packed.count() == n_samp
    # shard budget semantics vs a sequential oracle over the same rows
    rows = sorted(
        ((r["doc_id"], r["n_tokens"], r["shard"]) for r in packed.collect())
    )
    acc = 0
    for _id, t, shard in rows:
        assert shard == acc // 60
        acc += t


def test_pipeline_partitioning_invariant(spark):
    outs = []
    for parts in (2, 8):
        *_, packed = _run_pipeline(spark, parts)
        outs.append(sorted((r["doc_id"], r["shard"], r["url"])
                           for r in packed.collect()))
    assert outs[0] == outs[1]
