"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus crawl throughput fields}.

--scaling: runs the identical crawl job at local[8] and local[32] on
the same pre-materialized corpus and reports URLs/s at both plus
scaling efficiency (T32/T8)/4 — the sandbox evidence for the
N -> 4N >= 0.8 criterion (BASELINE.md). Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# The first get_spark() in a python process pins the JVM heap for every
# later session (py4j reuses the gateway JVM). The default 8g thrashes:
# the cached bytes corpus (~3 GB deserialized) partially evicts and
# whole cache partitions silently RECOMPUTE (parquet scan + exchange)
# on every round — which shows up as a large, core-count-independent
# cost that wrecks both throughput and measured scaling. This VM has
# 128 GiB; give the bench JVM room before any session starts.
os.environ.setdefault("URLMAP_SPARK_DRIVER_MEM", "48g")

# bench corpus: Zipf-skewed hosts, bytes-free (the crawl never reads
# pixels; bytes stay out of every scan by schema, not just pruning)
BENCH_SEED = 42
BENCH_HOSTS = 500
BENCH_PAGES = 1_200_000
BENCH_DEPTH = 5
BENCH_SEEDS = 2000
BENCH_FANOUT = (8, 16)
JOIN_PARTS = 64  # fetch-join partitioning, fixed across cluster sizes

# payload-verified crawl corpus (bytes included): the north_star crawl
# decodes every fetched image and checks its perceptual hash — this is
# the per-page CPU that a real crawl pipeline carries
VP_HOSTS = 300
# URLMAP_BENCH_VP_PAGES: size-sweep hook for the scaling campaign.
# Per-round driver fixed cost (job scheduling, plan analysis, broadcast
# build, codegen) does not shrink with cores; a bigger corpus makes
# rounds longer without adding rounds (still depth 2), so measured
# scaling efficiency should RISE with corpus size if that fixed cost —
# and not the parallel fraction — is what the N->4N readings are losing.
# The corpus cache key includes the size, so sweep points don't collide.
VP_PAGES = int(os.environ.get("URLMAP_BENCH_VP_PAGES", "400000"))


def _sf_tag() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


CORPUS_VERSION = 2  # bump when row derivation changes (e.g. phash fn)


def corpus_path() -> str:
    return (f"/tmp/urlmap_bench_corpus_v{CORPUS_VERSION}_{BENCH_SEED}_"
            f"{BENCH_HOSTS}_{BENCH_PAGES}_{BENCH_FANOUT[0]}_{BENCH_FANOUT[1]}")


def vp_corpus_path() -> str:
    return f"/tmp/urlmap_bench_vpcorpus_v{CORPUS_VERSION}_{BENCH_SEED}_{VP_HOSTS}_{VP_PAGES}"


def ensure_vp_corpus(spark) -> str:
    p = vp_corpus_path()
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        from urlmap_spark.sources.corpus import corpus_spark

        corpus_spark(spark, seed=BENCH_SEED, n_hosts=VP_HOSTS,
                     total_pages=VP_PAGES, with_bytes=True,
                     partitions=CPUS * 4, fanout=BENCH_FANOUT).write.mode("overwrite").parquet(p)
    return p


def _ceiling_work(args):
    """Pure-multiprocessing decode+phash kernel (one worker's share)."""
    seed0, n = args
    import time as _t

    import numpy as np

    from urlmap_spark.sources import corpus as C

    rng = np.random.default_rng(seed0)
    blobs = []
    for i in range(2000):
        w = (32, 48, 64)[i % 3]
        h = (32, 48, 64)[(i >> 2) % 3]
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blobs.append((C.encode_png(px), "png") if i % 2 else (C.encode_ppm(px), "ppm"))
    t0 = _t.time()
    for k in range(n):
        b, f = blobs[k % len(blobs)]
        C.phash_of(C.decode_image(b, f))
    return _t.time() - t0


def _memcpy_work(args):
    """Pure-multiprocessing memory-bandwidth kernel (8 MiB block copies)
    — the ceiling for SHUFFLE/SERIALIZATION-bound stages, which are
    memcpy at heart (Arrow page writes, lz4, shuffle spill)."""
    seed, n = args
    import time as _t

    import numpy as np

    src = np.random.default_rng(seed).integers(0, 256, size=8 << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    t0 = _t.time()
    for _ in range(n):
        np.copyto(dst, src)
        dst[::4096] ^= 1
    return _t.time() - t0


def measure_ceiling(lo: int, hi: int, total: int = 160_000,
                    memcpy_total: int = 16_000) -> dict:
    """The SILICON's own N->4N scaling measured with plain
    multiprocessing (no Spark) at the same two operating points, in the
    same run, for the TWO resource classes the crawl mixes:

    - compute (decode+phash kernel): ~0.96-1.0 at 2->8 on a quiet host
      (vs ~0.77 at 4->16 — the all-core turbo drop, which is why the
      operating points are 2/8);
    - memory bandwidth (8 MiB memcpy kernel): ~0.58 at 2->8 — DRAM
      saturates at TWO processes on this box, so any shuffle/serialize
      stage is bandwidth-capped far below 0.8 regardless of engine. On
      a real multi-executor cluster this resource scales WITH the nodes
      (each executor brings its own memory channels); on one box it is
      the sandbox artifact the engine numbers must be read against.

    Engine efficiency is judged against these measured ceilings, not an
    assumed 1.0."""
    import multiprocessing as mp

    res, mres = {}, {}
    for p in (lo, hi):
        with mp.Pool(p) as pool:
            ts = pool.map(_ceiling_work, [(j, total // p) for j in range(p)])
            res[p] = max(ts)  # slowest worker = stage wall
        with mp.Pool(p) as pool:
            ts = pool.map(_memcpy_work, [(j, memcpy_total // p) for j in range(p)])
            mres[p] = max(ts)
    return {"lo_s": round(res[lo], 2), "hi_s": round(res[hi], 2),
            "eff": round(res[lo] / res[hi] / 4, 3),
            "memcpy_eff": round(mres[lo] / mres[hi] / 4, 3)}


def run_verified_crawl(spark, corpus_parquet: str) -> dict:
    """Fat-frontier payload-verified crawl: every fetched page's bytes are
    decoded and phash-checked (input_hint per-row invariant)."""
    from pyspark.sql import functions as F

    from urlmap_spark.plans.crawl import CrawlConfig, crawl

    # small Arrow batches pipeline the JVM->Python byte transfer against
    # the decode compute inside each task (one 10k-row batch per task
    # serializes the whole partition before Python starts): measured 18%
    # on the decode stage at 8 cores. Env override is the A/B hook
    # (tools/ab_arrow_batch.py).
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   os.environ.get("URLMAP_BENCH_ARROW_BATCH", "1024"))
    corpus = cached_corpus(spark, corpus_parquet)
    corpus.count()
    seeds = corpus.select("url").filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
    t0 = time.time()
    run = crawl(spark, corpus, seeds,
                CrawlConfig(max_depth=2, same_domain=False, verify_payload=True))
    wall = time.time() - t0
    processed = sum(m.get("processed", 0) for m in run.metrics)
    verified = sum(m.get("payload_ok", 0) for m in run.metrics)
    crawled = sum(m.get("crawled", 0) for m in run.metrics)
    corpus.unpersist()
    # steady = in-round throughput over at-scale rounds (>=10k frontier),
    # the same metric workload A reports: it excludes one-time setup
    # (corpus cache load, seed-list canonicalization, final metric fold)
    # that a 3-round benchmark cannot amortize but a real crawl's
    # hundreds of rounds do
    big = [m for m in run.metrics if m.get("frontier", 0) >= 10_000]
    steady = (sum(m["processed"] for m in big) / sum(m["wall_s"] for m in big)) if big else 0.0
    return {
        "wall_s": round(wall, 2),
        "processed": processed,
        "crawled": crawled,
        "payload_verified": verified,
        "urls_per_sec": round(processed / wall, 1),
        "steady_urls_per_sec": round(steady, 1),
        "rounds": run.rounds,
    }


def ensure_corpus(spark) -> str:
    p = corpus_path()
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        from urlmap_spark.sources.corpus import corpus_spark

        corpus_spark(spark, seed=BENCH_SEED, n_hosts=BENCH_HOSTS,
                     total_pages=BENCH_PAGES, with_bytes=False,
                     partitions=CPUS * 2, fanout=BENCH_FANOUT).write.mode("overwrite").parquet(p)
    return p


def cached_corpus(spark, corpus_parquet: str):
    """The corpus cached hash-partitioned AND sorted on the join key:
    the per-round fetch-join then needs NO exchange and NO sort on the
    big side (the cluster-version of an Iceberg table bucketed by url).
    ONE definition shared by every caller — the bucketing scheme must
    not drift between single-shot and best-of-N paths."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(corpus_parquet)
        .repartition(JOIN_PARTS, F.col("url"))
        .sortWithinPartitions("url")
        .persist()
    )


def run_crawl(spark, corpus_parquet: str, corpus=None) -> dict:
    from urlmap_spark.plans.crawl import CrawlConfig, crawl

    # A caller doing best-of-N trials passes the already-cached corpus in
    # so trials don't stack persisted copies.
    if corpus is None:
        corpus = cached_corpus(spark, corpus_parquet)
    corpus.count()  # materialize the cache outside the timed window
    # seed list (north_rule: "under the same seed list"): every host root
    # plus a deterministic stride of interior pages — fat frontier from
    # round 0, so throughput is measured on real work, not BFS warm-up
    from urlmap_spark.sources.corpus import host_page_index, page_url

    idx = host_page_index(BENCH_SEED, BENCH_HOSTS, BENCH_PAGES)
    roots = [page_url(BENCH_SEED, hi, 0) for hi in range(BENCH_HOSTS)]
    stride = max(1, len(idx) // max(1, BENCH_SEEDS - BENCH_HOSTS))
    interior = [page_url(BENCH_SEED, hi, pj) for hi, pj, _ in idx[::stride]]
    seeds = (roots + interior)[:BENCH_SEEDS]

    t0 = time.time()
    run = crawl(spark, corpus, seeds,
                CrawlConfig(max_depth=BENCH_DEPTH, same_domain=False))
    processed = sum(m.get("processed", 0) for m in run.metrics)
    wall = time.time() - t0
    big = [m for m in run.metrics if m.get("frontier", 0) >= 10_000]
    steady = (sum(m["processed"] for m in big) / sum(m["wall_s"] for m in big)) if big else 0.0
    return {
        "wall_s": round(wall, 2),
        "processed": processed,
        "urls_per_sec": round(processed / wall, 1),
        "steady_urls_per_sec": round(steady, 1),
        "rounds": run.rounds,
    }


def run_headline(spark) -> dict[str, float]:
    """Per-operator wall times at SF_DIR (forced with a cheap action)."""
    import __spark_entry__ as E

    picks = [
        "fetch-join", "stats-agg", "per-host-quota-topk", "seen-anti-join",
        "first-wins-dedup", "url-normalize", "extract-explode",
        "dedup-exact", "dedup-minhash-lsh", "dedup-ngram-capped",
        "embed-cosine-topk", "embed-ann-lsh", "text-langid", "text-quality",
        "token-count", "image-decode-meta", "image-phash-neardup",
        "stream-window-metrics", "caption-align-gate",
    ]
    qs = E.queries()
    out = {}
    for name in picks:
        # best-of-2: single-shot per-query times swing up to 3x between
        # windows on this host (image-decode-meta observed 9.2s and
        # 29.7s on identical code)
        best = None
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        out[name] = best
    return out


def main() -> None:
    from urlmap_spark.session import get_spark

    if "--scaling" in sys.argv:
        # --trials N (default 3): more interleaved pairs = more chances of
        # a same-silicon attributable reading when the host window is
        # hostile. --workload light|vp|both (default both): a focused run
        # spends its whole wall budget on the workload under study.
        argv = sys.argv
        trials = int(argv[argv.index("--trials") + 1]) \
            if "--trials" in argv else 3
        workload = argv[argv.index("--workload") + 1] \
            if "--workload" in argv else "both"
        if workload not in ("light", "vp", "both"):
            raise SystemExit(f"--workload must be light|vp|both, got {workload}")
        run_light = workload in ("light", "both")
        run_vp = workload in ("vp", "both")
        results = {}
        cp = vcp = None
        if run_light:
            gen_spark = get_spark(master=f"local[{CPUS}]", app_name="bench_gen")
            cp = ensure_corpus(gen_spark)
            gen_spark.stop()
        if run_vp:
            gen2 = get_spark(master=f"local[{CPUS}]", app_name="bench_gen_vp")
            vcp = ensure_vp_corpus(gen2)
            gen2.stop()
        # N vs 4N at 2 -> 8 cores: the widest pair of operating points that
        # stays inside this VM's all-core-turbo envelope. Measured with
        # plain multiprocessing (no Spark): pure decode+phash scales 0.96
        # at 2->8 but only ~0.77 at 4->16, pure blake2b ALU ~0.70 at
        # 4->16 — the silicon, not the engine, caps anything above 8 busy
        # cores. The same ceiling kernel is re-measured in THIS run (below)
        # so the engine is judged against today's machine, not an
        # assumption. Best-of-N trials de-noise the shared host (observed
        # run-to-run swings up to 3x on identical plans).
        # --points LO,HI (default 2,8): an alternate N->4N pair. 1,4 is
        # the complementary operating point to the standing 2,8 campaign:
        # at 4 busy cores this box's shared DRAM is NOT yet saturated
        # (memcpy kernel ~0.58 at 2->8 because saturation hits at two
        # processes), so the 1->4 pair measures the engine where the
        # sandbox's bandwidth wall does not bind — the regime a real
        # multi-executor cluster is in, since each node brings its own
        # memory channels.
        if "--points" in argv:
            lo, hi = (int(x) for x in argv[argv.index("--points") + 1].split(","))
            if hi != 4 * lo or lo < 1:
                raise SystemExit(f"--points must be an N,4N pair, got {lo},{hi}")
        else:
            lo, hi = (2, 8)
        ceiling = measure_ceiling(lo, hi)
        # INTERLEAVED trials: each trial index runs lo then hi back to
        # back (light pair, then VP pair). The drift this host exhibits
        # (BENCH/BASELINE.md r3-9/-10/-12: many-minute windows where
        # 2-core runs fast while 8-core runs slow, or vice versa) biases
        # a blocked all-lo-then-all-hi schedule systematically — the two
        # operating points sample DIFFERENT silicon. Adjacent pairs see
        # near-identical silicon, and the per-pair efficiency list makes
        # any residual drift visible in the report instead of silently
        # contaminating the headline ratio.
        results = {lo: None, hi: None}
        vres = {lo: None, hi: None}
        pair_eff = {"light": [], "vp": []}
        # per-trial walls + steady throughput per operating point: the
        # best-of fold below erases which SIDE of a slow pair stalled
        # (r3-40 could not attribute its four 0.34-0.42 pairs to either
        # operating point); these lists keep the raw per-trial numbers
        per_trial = {"light": [], "vp": []}
        # per-PAIR ceiling snapshots: the whole-run ceiling above samples
        # the silicon once, but this host drifts WITHIN a run (r3-13's
        # light pairs [0.13, 1.02, 0.31]); a quick kernel re-measure
        # adjacent to each trial pair lets every pair efficiency be read
        # against the silicon's own scaling AT THAT MOMENT — hostile
        # windows then still yield attributable (ceiling-normalized)
        # readings instead of uninterpretable ratios
        pair_ceilings = []

        def _one(fn, corpus_path_, n, tag):
            spark = get_spark(master=f"local[{n}]", app_name=f"bench_{tag}_{n}")
            spark.sparkContext.setLogLevel("ERROR")
            r = fn(spark, corpus_path_)
            spark.stop()
            return r

        for _t in range(trials):
            c = measure_ceiling(lo, hi, total=48_000, memcpy_total=6_000)
            pair_ceilings.append({"comp": c["eff"], "memcpy": c["memcpy_eff"]})
            if run_light:
                pair = {n: _one(run_crawl, cp, n, "crawl") for n in (lo, hi)}
                pair_eff["light"].append(round(
                    (pair[hi]["urls_per_sec"] / pair[lo]["urls_per_sec"]) / 4.0, 3))
                per_trial["light"].append({
                    f"local{n}": {"wall_s": pair[n]["wall_s"],
                                  "steady": pair[n]["steady_urls_per_sec"]}
                    for n in (lo, hi)})
                for n in (lo, hi):
                    if results[n] is None or \
                            pair[n]["urls_per_sec"] > results[n]["urls_per_sec"]:
                        results[n] = pair[n]
            if run_vp:
                vpair = {n: _one(run_verified_crawl, vcp, n, "vp") for n in (lo, hi)}
                pair_eff["vp"].append(round(
                    (vpair[hi]["urls_per_sec"] / vpair[lo]["urls_per_sec"]) / 4.0, 3))
                per_trial["vp"].append({
                    f"local{n}": {"wall_s": vpair[n]["wall_s"],
                                  "steady": vpair[n]["steady_urls_per_sec"]}
                    for n in (lo, hi)})
                for n in (lo, hi):
                    if vres[n] is None or \
                            vpair[n]["urls_per_sec"] > vres[n]["urls_per_sec"]:
                        vres[n] = vpair[n]
        # VP is decode-dominated, so its natural ceiling is the compute
        # kernel: the normalized reading is "fraction of the silicon's
        # own 2->8 scaling the engine achieved in that pair's window",
        # capped at 1.0 (a kernel more depressed than the engine itself
        # cannot push the reading above parity)
        report = {
            "trials": trials, "workload": workload, "points": [lo, hi],
            # corpus size under study (URLMAP_BENCH_VP_PAGES): the
            # session-13 sweep showed measured efficiency rises with
            # corpus size (per-round driver fixed cost amortizes), so a
            # campaign record is not interpretable without this knob
            "vp_pages": VP_PAGES,
            "silicon_ceiling_efficiency": ceiling["eff"],
            "silicon_memcpy_ceiling_efficiency": ceiling["memcpy_eff"],
            # per-pair silicon snapshots (same-moment attribution)
            "pair_ceilings": pair_ceilings,
        }
        if run_light:
            eff = (results[hi]["urls_per_sec"]
                   / results[lo]["urls_per_sec"]) / 4.0
            eff_steady = (results[hi]["steady_urls_per_sec"]
                          / max(results[lo]["steady_urls_per_sec"], 1e-9)) / 4.0
            report.update({
                f"local{lo}": results[lo], f"local{hi}": results[hi],
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_steady": round(eff_steady, 3),
                "best_pair_efficiency": round(max(pair_eff["light"]), 3),
            })
        if run_vp:
            vp_vs_ceiling = [
                round(min(e / max(c["comp"], 1e-9), 1.0), 3)
                for e, c in zip(pair_eff["vp"], pair_ceilings)
            ]
            # the same pair read against the MEMCPY ceiling: the VP crawl
            # is DRAM-bound at the 8-core point (BENCH/BASELINE.md codec
            # A/B + r3-32/-36 same-moment separations), so the bandwidth
            # kernel is its natural ceiling; until now this reading was
            # hand-computed per campaign record
            vp_vs_memcpy = [
                round(min(e / max(c["memcpy"], 1e-9), 1.0), 3)
                for e, c in zip(pair_eff["vp"], pair_ceilings)
            ]
            eff_vp = (vres[hi]["urls_per_sec"] / vres[lo]["urls_per_sec"]) / 4.0
            eff_vp_steady = (vres[hi]["steady_urls_per_sec"]
                             / max(vres[lo]["steady_urls_per_sec"], 1e-9)) / 4.0
            report.update({
                f"vp_local{lo}": vres[lo], f"vp_local{hi}": vres[hi],
                "scaling_efficiency_verified": round(eff_vp, 3),
                "scaling_efficiency_verified_steady": round(eff_vp_steady, 3),
                "verified_vs_ceiling": round(eff_vp / ceiling["eff"], 3),
                "best_pair_efficiency_verified": round(max(pair_eff["vp"]), 3),
                # the VP pair read against ITS OWN pair's compute ceiling
                "pair_vp_vs_ceiling": vp_vs_ceiling,
                "best_pair_vp_vs_ceiling": round(max(vp_vs_ceiling), 3),
                "pair_vp_vs_memcpy": vp_vs_memcpy,
                "best_pair_vp_vs_memcpy": round(max(vp_vs_memcpy), 3),
            })
        # mechanical stall detection (pre-declared, reporting only — the
        # campaign record still carries every pair uncurated): a pair is
        # "stalled" when either of its walls exceeds 1.5x the run's best
        # wall at that operating point. r3-41's per-trial walls showed the
        # recurring low-pair-under-clean-kernels shape is a host stall on
        # one side (8-core wall == its own 2-core wall); this rule names
        # those pairs in the JSON instead of leaving the read to the
        # record's prose.
        stalled = {}
        for wk, rows in per_trial.items():
            if not rows:
                continue
            best_wall = {n: min(r[f"local{n}"]["wall_s"] for r in rows)
                         for n in (lo, hi)}
            stalled[wk] = [
                i for i, r in enumerate(rows)
                if any(r[f"local{n}"]["wall_s"] > 1.5 * best_wall[n]
                       for n in (lo, hi))
            ]
        report["stalled_pairs"] = stalled
        clean = {
            wk: [e for i, e in enumerate(pair_eff[wk])
                 if i not in set(stalled.get(wk, []))]
            for wk in pair_eff if pair_eff[wk]
        }
        report["clean_pair_efficiencies"] = clean
        report["best_clean_pair_efficiency"] = {
            wk: round(max(v), 3) for wk, v in clean.items() if v}
        # per-trial adjacent-pair efficiencies (drift diagnostic): wide
        # spread here = the host drifted DURING the run; the best pair is
        # the least-contaminated same-silicon reading
        report["pair_efficiencies"] = {
            k: v for k, v in pair_eff.items() if v}
        report["per_trial"] = {k: v for k, v in per_trial.items() if v}
        print(json.dumps(report))
        if not (run_light and run_vp):
            return  # focused run: report only; the md needs both workloads
        os.makedirs("BENCH", exist_ok=True)
        # BASELINE.md is the curated multi-run report; each invocation
        # drops its raw result next to it
        with open("BENCH/last_scaling_run.md", "w") as f:
            f.write(
                "# BENCH — crawl scaling evidence (sandbox N vs 4N)\n\n"
                f"Corpus: {BENCH_PAGES} pages / {BENCH_HOSTS} Zipf(1.2) hosts, seed={BENCH_SEED}, "
                f"BFS max_depth={BENCH_DEPTH}, identical input parquet for both runs.\n\n"
                f"Seed list: {BENCH_SEEDS} seeds (all host roots + stride sample); "
                f"best of {trials} INTERLEAVED trials per operating point "
                f"(each trial runs local[{lo}] and local[{hi}] back to back, so "
                "adjacent pairs see the same silicon; per-pair efficiencies "
                "below expose any in-run drift).\n\n"
                "| cores | wall s | URLs processed | URLs/s | steady URLs/s | rounds |\n"
                "|---|---|---|---|---|---|\n"
                f"| local[{lo}] | {results[lo]['wall_s']} | {results[lo]['processed']} | "
                f"{results[lo]['urls_per_sec']} | {results[lo]['steady_urls_per_sec']} | {results[lo]['rounds']} |\n"
                f"| local[{hi}] | {results[hi]['wall_s']} | {results[hi]['processed']} | "
                f"{results[hi]['urls_per_sec']} | {results[hi]['steady_urls_per_sec']} | {results[hi]['rounds']} |\n\n"
                f"**Scaling efficiency N={lo} -> 4N={hi}: (T{hi}/T{lo})/4 = {eff:.3f}** "
                f"(steady-state rounds >=10k frontier rows: {eff_steady:.3f}; "
                f"target >= 0.8 per BASELINE.json north_rule; the reference's own "
                f"4x-worker efficiency was ~0.43, BASELINE.md).\n\n"
                f"Silicon ceilings measured in this run (pure multiprocessing, "
                f"no Spark) at {lo}->{hi} cores: compute (decode+phash) "
                f"**{ceiling['eff']:.3f}** ({ceiling['lo_s']}s -> {ceiling['hi_s']}s); "
                f"memory bandwidth (8 MiB memcpy) **{ceiling['memcpy_eff']:.3f}**.\n\n"
                "## Payload-verified crawl (north_star per-row invariant in the loop)\n\n"
                f"{VP_PAGES} pages with real image bytes; every fetched page is decoded "
                "and phash-checked in the fetch stage (bytes never enter any shuffle "
                "beyond the fetch join).\n\n"
                "| cores | wall s | URLs processed | verified | URLs/s | steady URLs/s |\n"
                "|---|---|---|---|---|---|\n"
                f"| local[{lo}] | {vres[lo]['wall_s']} | {vres[lo]['processed']} | "
                f"{vres[lo]['payload_verified']} | {vres[lo]['urls_per_sec']} | "
                f"{vres[lo]['steady_urls_per_sec']} |\n"
                f"| local[{hi}] | {vres[hi]['wall_s']} | {vres[hi]['processed']} | "
                f"{vres[hi]['payload_verified']} | {vres[hi]['urls_per_sec']} | "
                f"{vres[hi]['steady_urls_per_sec']} |\n\n"
                f"**Verified-crawl scaling efficiency: {eff_vp:.3f} whole-run / "
                f"{eff_vp_steady:.3f} steady-state** "
                f"(= {eff_vp / ceiling['eff']:.3f} of the measured silicon "
                f"ceiling {ceiling['eff']:.3f}).\n\n"
                f"Per-pair (same-silicon) efficiencies — light: "
                f"{pair_eff['light']}, VP: {pair_eff['vp']}; best pair "
                f"light {max(pair_eff['light']):.3f} / VP "
                f"{max(pair_eff['vp']):.3f}.\n\n"
                f"Per-pair silicon ceilings (quick kernel re-measure before "
                f"each trial pair, comp/memcpy): "
                f"{[(c['comp'], c['memcpy']) for c in pair_ceilings]}; "
                f"VP pair vs its own pair's compute ceiling: "
                f"{vp_vs_ceiling} (best {max(vp_vs_ceiling):.3f}); vs its "
                f"own pair's memcpy ceiling (the DRAM-bound workload's "
                f"natural ceiling): {vp_vs_memcpy} "
                f"(best {max(vp_vs_memcpy):.3f}).\n\n"
                f"Stalled pairs by the mechanical wall rule (either wall "
                f"> 1.5x the run's best at that operating point): "
                f"{stalled}.\n\n"
                f"Operating points {lo}/{hi}: the default 2/8 is the widest "
                "N->4N pair inside this VM's all-core-turbo envelope — "
                "pure-multiprocessing kernels (no Spark) measure decode+phash "
                "at 0.96 for 2->8 but ~0.77 for 4->16 and blake2b ALU at "
                "~0.70 for 4->16, so any wider pair measures the silicon's "
                "frequency drop, not the engine; 1/4 (--points) is the "
                "complementary pair below the DRAM-saturation knee. The "
                "ceiling row above is re-measured in every run.\n"
            )
        return

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    cp = ensure_corpus(spark)
    # best-of-3 crawl trials against ONE cached corpus: this host's
    # run-to-run swings reach 3x on identical plans (BENCH/BASELINE.md),
    # so a single-shot crawl number is noise, not signal
    corpus = cached_corpus(spark, cp)
    trials = [run_crawl(spark, cp, corpus=corpus) for _ in range(3)]
    corpus.unpersist()
    crawl_stats = max(trials, key=lambda r: r["urls_per_sec"])
    queries = run_headline(spark)
    total = round(crawl_stats["wall_s"] + sum(queries.values()), 2)
    queries["crawl-bfs-sf0.1-corpus"] = crawl_stats["wall_s"]
    print(json.dumps({
        "metric": "headline_suite_wall_plus_crawl",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_tag(),
        "crawl_urls_per_sec": crawl_stats["urls_per_sec"],
        "crawl_steady_urls_per_sec": crawl_stats["steady_urls_per_sec"],
        "crawl_trials_urls_per_sec": [r["urls_per_sec"] for r in trials],
        "crawl_processed": crawl_stats["processed"],
        "crawl_rounds": crawl_stats["rounds"],
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
