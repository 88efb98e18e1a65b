"""Connected components + canonical docs (operators/components.py).

Oracle: a ~15-line pure-Python union-find. The Spark result must label
every paired node with its component MINIMUM, independent of input
partitioning, edge orientation, duplication, and id type.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from urlmap_spark.operators.components import (
    attach_components,
    canonical_docs,
    connected_components,
)


def uf_components(edges):
    """Union-find oracle: {node: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def spark_components(spark, edges, partitions=None):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    if partitions:
        df = df.repartition(partitions)
    got = connected_components(df)
    return {r["id"]: r["component"] for r in got.collect()}


def test_two_components_and_orientation(spark):
    # {1,2,3} via mixed orientations + duplicate edges, {10,11}
    edges = [(2, 1), (3, 2), (1, 2), (2, 3), (11, 10)]
    exp = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert spark_components(spark, edges) == exp


def test_self_loops_and_empty(spark):
    # self-loops carry no connectivity: node 5 vanishes (attach_
    # components is the layer that restores singletons)
    edges = [(5, 5), (7, 8)]
    assert spark_components(spark, edges) == {7: 7, 8: 7}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = connected_components(empty)
    assert got.collect() == []
    assert [f.name for f in got.schema.fields] == ["id", "component"]


def test_long_chain_needs_multiple_alternations(spark):
    # a 40-node path has diameter 39: label propagation would need ~39
    # rounds; large-star/small-star must still converge (well under the
    # max_iter rail) and label everything with the chain minimum
    n = 40
    edges = [(i, i + 1) for i in range(n)]
    exp = {i: 0 for i in range(n + 1)}
    assert spark_components(spark, edges, partitions=7) == exp


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow], derandomize=True)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=60),
    parts=st.integers(1, 6),
)
def test_fuzz_vs_union_find(spark, edges, parts):
    exp = uf_components([e for e in edges if e[0] != e[1]])
    assert spark_components(spark, edges, partitions=parts) == exp


def test_attach_components_defaults_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 4), (4, 2)], "id_a long, id_b long")
    got = {r["doc_id"]: r["component"]
           for r in attach_components(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 1, 5: 5}


def test_canonical_docs_quality_keeper(spark):
    # component {1,2,4}: doc 2 has the best quality -> keeper; ties on
    # quality resolve to the smaller id (component {3,5})
    docs = spark.createDataFrame(
        [(0, 10), (1, 3), (2, 9), (3, 7), (4, 9), (5, 7)],
        "doc_id long, n_chars long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 5)], "id_a long, id_b long")
    got = {r["doc_id"]: (r["component"], r["keeper_id"], r["is_duplicate"])
           for r in canonical_docs(docs, pairs, quality_col="n_chars").collect()}
    assert got == {
        0: (0, 0, False),
        1: (1, 2, True),
        2: (1, 2, False),
        4: (1, 2, True),
        3: (3, 3, False),
        5: (3, 3, True),
    }


def test_canonical_docs_null_quality_never_wins(spark):
    """A null quality ranks WORST, not best: struct min() puts a null
    field first, so without normalization the unscored member would be
    crowned keeper. Null-only components fall back to min id."""
    docs = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, None)],
        "doc_id long, n_chars long")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long")
    got = {r["doc_id"]: r["keeper_id"]
           for r in canonical_docs(docs, pairs, quality_col="n_chars").collect()}
    assert got == {1: 2, 2: 2, 3: 3, 4: 3}


def test_canonical_docs_min_id_keeper_passes_columns(spark):
    docs = spark.createDataFrame(
        [(4, "d"), (2, "b"), (9, "z")], "doc_id long, text string")
    pairs = spark.createDataFrame([(9, 4)], "id_a long, id_b long")
    out = canonical_docs(docs, pairs)
    assert {f.name for f in out.schema.fields} >= {
        "doc_id", "text", "component", "keeper_id", "is_duplicate"}
    got = {r["doc_id"]: (r["keeper_id"], r["is_duplicate"], r["text"])
           for r in out.collect()}
    assert got == {4: (4, False, "d"), 9: (4, True, "z"), 2: (2, False, "b")}


def test_end_to_end_with_ngram_pairs(spark):
    """The intended composition: near-dup pairs from the capped ngram
    generator feed component labeling; planted triplet collapses to one
    keeper."""
    from urlmap_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "completely unrelated text about spark engines"),
        (4, "another unique document body with no twin"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, n=3, max_shingle_df=10)
    out = canonical_docs(docs, pairs)
    got = {r["doc_id"]: (r["component"], r["is_duplicate"]) for r in out.collect()}
    assert got == {
        0: (0, False), 1: (0, True), 2: (0, True),
        3: (3, False), 4: (4, False),
    }


def test_semdedup_embedding_composition(spark):
    """SemDeDup composition (embed-dedup-canonical): sign-blocked cosine
    pairs -> components -> min-id keeper. Planted: vectors 0/1/2 nearly
    parallel (one semantic group, keeper 0), 3 the negation of 0 (other
    orthant -> different block, never paired), 4 orthogonal singleton."""
    from urlmap_spark.operators.dedup import embedding_neardup_pairs
    from urlmap_spark.operators.similarity import sign_block

    rows = [
        (0, [1.0, 0.5, 0.2]),
        (1, [0.99, 0.52, 0.21]),
        (2, [1.01, 0.49, 0.19]),
        (3, [-1.0, -0.5, -0.2]),
        (4, [0.1, -0.9, 0.3]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(
        sign_block(emb, dims=[0, 1, 2]), threshold=0.95, block_col="blk"
    ).select("id_a", "id_b")
    out = canonical_docs(emb.select("vec_id"), pairs, id_col="vec_id")
    got = {r["vec_id"]: (r["component"], r["keeper_id"], r["is_duplicate"])
           for r in out.collect()}
    assert got == {
        0: (0, 0, False), 1: (0, 0, True), 2: (0, 0, True),
        3: (3, 3, False), 4: (4, 4, False),
    }
    # partitioning invariance of the full composition
    out2 = canonical_docs(
        emb.repartition(7).select("vec_id"),
        embedding_neardup_pairs(
            sign_block(emb.repartition(3), dims=[0, 1, 2]),
            threshold=0.95, block_col="blk").select("id_a", "id_b"),
        id_col="vec_id")
    assert {tuple(r) for r in out2.collect()} == {tuple(r) for r in out.collect()}
