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
