"""Similarity search: brute-force exactness, LSH/IVF recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from urlmap_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    # 3 clusters of 40 vectors + 80 noise
    rows, vid = [], 0
    for c in range(3):
        center = rng.standard_normal(32) * 3
        for _ in range(40):
            rows.append((vid, (center + rng.standard_normal(32)).tolist(), c))
            vid += 1
    for _ in range(80):
        rows.append((vid, rng.standard_normal(32).tolist(), 9))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def _query(emb):
    return emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]


def test_brute_force_topk_exact(spark, emb):
    q = _query(emb)
    got = S.brute_force_topk(emb.filter("vec_id != 0"), q, k=10).collect()
    # recompute driver-side
    rows = emb.filter("vec_id != 0").collect()
    qv = np.array(q)
    sims = sorted(
        ((round(float(np.dot(r["embedding"], qv)
                      / (np.linalg.norm(r["embedding"]) * np.linalg.norm(qv))), 6),
          r["vec_id"]) for r in rows),
        key=lambda t: (-t[0], t[1]))[:10]
    assert [(r["cosine"], r["vec_id"]) for r in got] == sims
    # top hits come from the query's cluster
    labels = {r["vec_id"]: None for r in got}
    assert all(v < 40 for v in labels)


def test_lsh_topk_recall(spark, emb):
    q = _query(emb)
    exact = [r["vec_id"] for r in S.brute_force_topk(emb.filter("vec_id != 0"), q, k=10).collect()]
    approx = [r["vec_id"] for r in S.lsh_topk(emb.filter("vec_id != 0"), q, k=10,
                                              n_planes=6, multiprobe=2).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall(spark, emb):
    q = _query(emb)
    exact = [r["vec_id"] for r in S.brute_force_topk(emb.filter("vec_id != 0"), q, k=10).collect()]
    approx = [r["vec_id"] for r in S.ivf_topk(emb.filter("vec_id != 0"), q, k=10,
                                              n_centroids=8, nprobe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_lsh_bucket_deterministic(spark, emb):
    a = {r["vec_id"]: r["bucket"] for r in S.lsh_bucket(emb, dim=32, n_planes=6).collect()}
    b = {r["vec_id"]: r["bucket"] for r in S.lsh_bucket(emb.repartition(9), dim=32,
                                                        n_planes=6).collect()}
    assert a == b


def test_ivf_int_topk_recall_and_determinism(spark, emb):
    """The integer-quantized IVF twin: decent recall vs brute force
    (same cluster structure as ivf_topk), and identical output across
    different input partitionings (assignments are integer-exact, so
    no float-tie nondeterminism can creep in)."""
    q = _query(emb)
    rest = emb.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in S.brute_force_topk(rest, q, k=10).collect()]
    got1 = [(r["vec_id"], r["cosine"]) for r in
            S.ivf_topk_int(rest, q, k=10, n_centroids=8, nprobe=3, stride=13).collect()]
    got2 = [(r["vec_id"], r["cosine"]) for r in
            S.ivf_topk_int(rest.repartition(17), q, k=10, n_centroids=8,
                           nprobe=3, stride=13).collect()]
    assert got1 == got2
    recall = len(set(v for v, _ in got1) & set(exact)) / 10
    assert recall >= 0.5, f"ivf_int recall too low: {recall}"


def test_lsh_int_topk_recall_and_determinism(spark, emb):
    """Integer-sign LSH twin: multiprobe recall floor vs brute force,
    and partitioning-invariant output (integer dot signs cannot tie-
    flip across plans)."""
    q = _query(emb)
    rest = emb.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in S.brute_force_topk(rest, q, k=10).collect()]
    got1 = [(r["vec_id"], r["cosine"]) for r in
            S.lsh_topk_int(rest, q, k=10, n_planes=5, multiprobe=1, stride=11).collect()]
    got2 = [(r["vec_id"], r["cosine"]) for r in
            S.lsh_topk_int(rest.repartition(13), q, k=10, n_planes=5,
                           multiprobe=1, stride=11).collect()]
    assert got1 == got2
    recall = len(set(v for v, _ in got1) & set(exact)) / 10
    assert recall >= 0.4, f"lsh_int recall too low: {recall}"


def test_caption_alignment_gate(spark):
    """LAION-style alignment gate: planted pairs — identical (1.0,
    keep), orthogonal (0.0, drop), opposite (-1.0, drop), exactly-at-
    threshold (keep: >= contract). Plan stays native (no Python)."""
    rows = [
        ("same", [1.0, 0.0, 2.0], [1.0, 0.0, 2.0]),
        ("orth", [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        ("anti", [1.0, 2.0, 0.0], [-1.0, -2.0, 0.0]),
        # cos = 0.3 exactly: (1,0)·(0.3, sqrt(1-0.09)) = 0.3
        ("edge", [1.0, 0.0, 0.0], [0.3, float(np.sqrt(0.91)), 0.0]),
    ]
    pairs = spark.createDataFrame(
        rows, "image_id string, image_emb array<float>, caption_emb array<float>")
    out = {r["image_id"]: (r["alignment"], r["keep"])
           for r in S.caption_alignment(pairs, threshold=0.3).collect()}
    assert out["same"] == (1.0, True)
    assert out["orth"] == (0.0, False)
    assert out["anti"] == (-1.0, False)
    assert out["edge"][0] == pytest.approx(0.3, abs=1e-6)
    assert out["edge"][1] is True  # >= threshold keeps
    # keep is an audit flag, not a drop: all rows survive
    assert len(out) == 4
    plan = S.caption_alignment(pairs, 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_caption_alignment_partition_invariance(spark, emb):
    """Same verdicts regardless of partitioning (rounded-score
    contract), over the clustered fixture paired id<->id+1."""
    a = emb.select("vec_id", F.col("embedding").alias("image_emb"))
    b = emb.select((F.col("vec_id") - 1).alias("vec_id"),
                   F.col("embedding").alias("caption_emb"))
    pairs = a.join(b, "vec_id")
    g1 = sorted((r["vec_id"], r["alignment"], r["keep"]) for r in
                S.caption_alignment(pairs, 0.2, id_col="vec_id").collect())
    g2 = sorted((r["vec_id"], r["alignment"], r["keep"]) for r in
                S.caption_alignment(pairs.repartition(17), 0.2,
                                    id_col="vec_id").collect())
    assert g1 == g2
    assert any(k for _, _, k in g1) and not all(k for _, _, k in g1)


def test_ivf_trained_recall_floor(spark, emb):
    """Distributed Lloyd training (ivf_train) must lift recall over the
    driver-sample mini-kmeans seeds — VERDICT r3 #5 raised floor."""
    q = _query(emb)
    exact = [r["vec_id"] for r in
             S.brute_force_topk(emb.filter("vec_id != 0"), q, k=10).collect()]
    approx = [r["vec_id"] for r in
              S.ivf_topk(emb.filter("vec_id != 0"), q, k=10,
                         n_centroids=8, nprobe=3, train_iters=5).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, f"trained IVF recall too low: {recall}"


def test_ivf_train_partitioning_invariant_recall(spark, emb):
    """Training is a dataset property: the same corpus at a different
    partitioning must still clear the trained-recall floor."""
    q = _query(emb)
    rest = emb.filter("vec_id != 0").repartition(17)
    exact = [r["vec_id"] for r in S.brute_force_topk(rest, q, k=10).collect()]
    c = S.ivf_train(rest, n_centroids=8, iters=5)
    assert c.shape == (8, 32)
    approx = [r["vec_id"] for r in
              S.ivf_topk(rest, q, k=10, nprobe=3, centroids=c).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, f"trained IVF recall too low: {recall}"


def test_ivf_assign_matmul_matches_expression_path(spark, emb):
    """The broadcast-matmul assignment (the >hundreds-of-centroids scale
    form) must agree with the expression-path ivf_assign cell for cell
    on the clustered fixture — same cosine argmax, same first-max
    tie-break."""
    import numpy as np

    c = S.ivf_centroids(emb, n_centroids=8)
    a = {r["vec_id"]: r["cell"] for r in S.ivf_assign(emb, c).select("vec_id", "cell").collect()}
    b = {r["vec_id"]: r["cell"]
         for r in S.ivf_assign_matmul(emb, c).select("vec_id", "cell").collect()}
    assert a == b
    # and at a centroid count past what the expression path would build
    big = np.vstack([c] * 40)  # 320 "centroids" (rows repeat: argmax -> first)
    got = S.ivf_assign_matmul(emb, big).select("vec_id", "cell").collect()
    assert all(r["cell"] < 8 for r in got)  # first occurrence wins


def test_ivf_probe_topk_int_matches_single_query(spark, emb):
    """The batch index/probe split must reproduce ivf_topk_int exactly
    when the query table holds one query — same centroid rule, same
    quantized dots, same tie-breaks."""
    q = _query(emb)
    rest = emb.filter(F.col("vec_id") != 0)
    single = [(r["vec_id"], r["cosine"]) for r in
              S.ivf_topk_int(rest, q, k=10, n_centroids=8, nprobe=3,
                             stride=13).collect()]
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    batch = [(r["vec_id"], r["cosine"]) for r in
             S.ivf_probe_topk_int(rest, queries, k=10, n_centroids=8,
                                  nprobe=3, stride=13).collect()]
    assert batch == single


def test_ivf_probe_topk_int_partition_invariance(spark, emb):
    """Batch probe output is a dataset property: identical rows at a
    different corpus/query partitioning (integer-exact comparisons,
    rank windows fully tie-broken)."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    rest = emb.filter(F.col("vec_id") >= 3)
    a = [(r["query_id"], r["vec_id"], r["cosine"]) for r in
         S.ivf_probe_topk_int(rest, queries, k=5, n_centroids=8,
                              nprobe=3, stride=13).collect()]
    b = [(r["query_id"], r["vec_id"], r["cosine"]) for r in
         S.ivf_probe_topk_int(rest.repartition(17), queries.repartition(5),
                              k=5, n_centroids=8, nprobe=3,
                              stride=13).collect()]
    assert a == b
    assert len(a) == 15  # 3 queries x k


def test_ivf_probe_topk_matches_per_query_ivf(spark, emb):
    """Float production path: ivf_index + ivf_probe_topk over a query
    table must return, for each query, the same ranked rows as a
    per-query ivf_topk call with the SAME centroids — the split changes
    the number of corpus scans (1 vs Q), never the answer."""
    c = S.ivf_centroids(emb.filter("vec_id >= 3"), n_centroids=8)
    rest = emb.filter(F.col("vec_id") >= 3)
    indexed = S.ivf_index(rest, c)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    batch = {}
    for r in S.ivf_probe_topk(indexed, queries, c, k=10, nprobe=3).collect():
        batch.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for r in emb.filter("vec_id < 3").collect():
        single = [(x["vec_id"], x["cosine"]) for x in
                  S.ivf_topk(rest, r["embedding"], k=10, nprobe=3,
                             centroids=c).collect()]
        assert batch[r["vec_id"]] == single, f"query {r['vec_id']} diverged"


def test_ivf_probe_topk_single_corpus_scan(spark, emb):
    """The split's point: Q queries cost ONE corpus scan. The physical
    plan of a 3-query batch must reference the corpus exactly once
    (one assignment pipeline feeding one broadcast probe join)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        emb.filter("vec_id >= 3").write.parquet(d + "/corpus")
        corpus = spark.read.parquet(d + "/corpus")
        c = S.ivf_centroids(corpus, n_centroids=8)
        indexed = S.ivf_index(corpus, c)
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding")
        plan = S.ivf_probe_topk(indexed, queries, c, k=10, nprobe=3) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("/corpus") == 1, plan


def test_ivf_train_matmul_threshold_equivalence(spark, emb):
    """ivf_train past matmul_threshold switches assignment to the
    broadcast-matmul path (ADVICE r4) — trained centroids must agree
    with the expression path's."""
    import numpy as np

    rest = emb.filter("vec_id != 0")
    c_expr = S.ivf_train(rest, n_centroids=8, iters=3)
    c_mm = S.ivf_train(rest, n_centroids=8, iters=3, matmul_threshold=0)
    assert np.allclose(c_expr, c_mm)


def test_lsh_probe_topk_int_matches_single_query(spark, emb):
    """LSH batch split reproduces lsh_topk_int exactly for a one-query
    table (same plane rule, same quantized signs, same probe set)."""
    q = _query(emb)
    rest = emb.filter(F.col("vec_id") != 0)
    single = [(r["vec_id"], r["cosine"]) for r in
              S.lsh_topk_int(rest, q, k=10, n_planes=5, multiprobe=1,
                             stride=11).collect()]
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    batch = [(r["vec_id"], r["cosine"]) for r in
             S.lsh_probe_topk_int(rest, queries, k=10, n_planes=5,
                                  multiprobe=1, stride=11).collect()]
    assert batch == single


def test_lsh_probe_topk_matches_per_query(spark, emb):
    """Float production path: lsh_bucket (the build step) +
    lsh_probe_topk over a query table returns, per query, the same
    ranked rows as per-query lsh_topk with the SAME planes."""
    import numpy as np

    rest = emb.filter(F.col("vec_id") >= 3)
    planes = S._hyperplanes(32, 6, seed=42)
    bucketed = S.lsh_bucket(rest, dim=32, n_planes=6, seed=42)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    batch = {}
    for r in S.lsh_probe_topk(bucketed, queries, planes, k=10,
                              multiprobe=1).collect():
        batch.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for r in emb.filter("vec_id < 3").collect():
        single = [(x["vec_id"], x["cosine"]) for x in
                  S.lsh_topk(rest, r["embedding"], k=10, n_planes=6,
                             seed=42, multiprobe=1).collect()]
        assert batch.get(r["vec_id"], []) == single, \
            f"query {r['vec_id']} diverged"


def test_lsh_probe_topk_int_partition_invariance(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    rest = emb.filter(F.col("vec_id") >= 3)
    a = [(r["query_id"], r["vec_id"], r["cosine"]) for r in
         S.lsh_probe_topk_int(rest, queries, k=5, n_planes=5,
                              multiprobe=1, stride=11).collect()]
    b = [(r["query_id"], r["vec_id"], r["cosine"]) for r in
         S.lsh_probe_topk_int(rest.repartition(13), queries.repartition(2),
                              k=5, n_planes=5, multiprobe=1,
                              stride=11).collect()]
    assert a == b
