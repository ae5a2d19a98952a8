"""Connected-components dedup clustering: alternating star algorithm vs a
driver-side union-find on the same edges, plus graph shapes that stress
convergence (long chains, stars, multiple components, singletons)."""

import random

import pytest
from pyspark.sql import Row

from configurable_etl_python_repo_spark.llm.clusters import (
    connected_components,
    dedup_clusters,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every node with the component MINIMUM (path-compress twice so
    # every chain resolves to the true root)
    return {x: find(x) for x in range(n_nodes)}


def _spark_labels(spark, edges):
    df = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges] or [], "id_a long, id_b long"
    )
    return {r.id: r.cluster_id for r in connected_components(df).collect()}


def test_chain_converges_to_min(spark):
    # path graph 0-1-2-...-19: one component, worst case for naive
    # label propagation (diameter = n), few rounds for alternating star
    edges = [(i, i + 1) for i in range(19)]
    labels = _spark_labels(spark, edges)
    assert labels == {i: 0 for i in range(20)}


def test_two_components_and_direction_independence(spark):
    edges = [(5, 3), (3, 9), (2, 8), (8, 2)]  # dup edge reversed
    labels = _spark_labels(spark, edges)
    assert labels == {3: 3, 5: 3, 9: 3, 2: 2, 8: 2}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expect = _union_find(n, edges)
        touched = {x for e in edges for x in e}
        labels = _spark_labels(spark, edges)
        assert labels == {x: expect[x] for x in touched}


def test_dedup_clusters_keeper_and_singletons(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(6)])
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=4), Row(id_a=4, id_b=5)]
    )
    out = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert {d: r.cluster_id for d, r in out.items()} == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1
    }
    assert [d for d, r in sorted(out.items()) if r.is_keeper] == [0, 1, 2, 3]
    assert out[4].cluster_size == 3 and out[0].cluster_size == 1


def _spark_labels_capped(spark, edges, cap):
    df = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges] or [], "id_a long, id_b long"
    )
    return {
        r.id: r.cluster_id
        for r in connected_components(df, degree_cap=cap).collect()
    }


def test_degree_cap_bridge_graph_is_exact(spark):
    # 1-5, 2-6, 5-6: one path component. With cap=1 each of 5 and 6 keeps
    # only its SMALLER neighbor (1 and 2), so the capped subgraph drops
    # the 5-6 bridge and phase 1 alone would answer {1,5} | {2,6} —
    # exactly the failure mode the contraction pass repairs.
    edges = [(1, 5), (2, 6), (5, 6)]
    from configurable_etl_python_repo_spark.llm.clusters import (
        _cap_edges,
        _normalize_edges,
    )

    e = _normalize_edges(
        spark.createDataFrame(
            [Row(u=a, v=b) for a, b in edges], "u long, v long"
        )
    )
    capped = {(r.u, r.v) for r in _cap_edges(e, 1).collect()}
    assert (6, 5) not in capped and (5, 6) not in capped  # bridge dropped
    assert _spark_labels_capped(spark, edges, cap=1) == {
        1: 1, 2: 1, 5: 1, 6: 1
    }


def test_degree_cap_matches_uncapped_on_random_graphs(spark):
    rng = random.Random(13)
    for trial, cap in [(0, 1), (1, 2), (2, 3)]:
        n = 50
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45 + 15 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_labels_capped(spark, edges, cap) == _spark_labels(
            spark, edges
        )


def test_degree_cap_clique_and_star(spark):
    # clique of 8 (the boilerplate shape degree capping exists for) and a
    # hub star — both collapse to the min under any cap
    clique = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    star = [(100, 100 + i) for i in range(1, 12)]
    labels = _spark_labels_capped(spark, clique + star, cap=2)
    assert labels == {
        **{i: 0 for i in range(8)},
        **{100 + i: 100 for i in range(12)},
    }


def test_degree_cap_adaptive_skip_when_cap_never_binds(spark):
    # max symmetric degree 2 (a path) with cap=8: the degree probe must
    # route to the plain star rounds and still produce the exact labels
    from configurable_etl_python_repo_spark.llm.clusters import (
        _max_degree,
        _normalize_edges,
    )

    edges = [(1, 2), (2, 3), (10, 11)]
    e = _normalize_edges(
        spark.createDataFrame(
            [Row(u=a, v=b) for a, b in edges], "u long, v long"
        )
    )
    assert _max_degree(e) == 2
    assert _spark_labels_capped(spark, edges, cap=8) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10
    }
    empty = _normalize_edges(
        spark.createDataFrame([], "u long, v long")
    )
    assert _max_degree(empty) == 0


def test_degree_cap_validation(spark):
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2)])
    with pytest.raises(ValueError, match="degree_cap"):
        connected_components(pairs, degree_cap=0).collect()


def test_string_ids(spark):
    # min-id semantics must hold for any orderable id type
    pairs = spark.createDataFrame(
        [Row(id_a="doc-b", id_b="doc-a"), Row(id_a="doc-b", id_b="doc-c")]
    )
    labels = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert labels == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a"}


def test_dedup_clusters_quality_aware_keeper(spark):
    """score_col switches the keeper from min-id to argmax score with
    min-id ties — singletons keep themselves, and the default policy is
    unchanged."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, n=s) for i, s in
         [(0, 5), (1, 3), (2, 9), (3, 9), (4, 1), (5, 7)]]
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=4, id_b=5)]
    )
    out = {r.doc_id: r for r in
           dedup_clusters(docs, pairs, score_col="n").collect()}
    # cluster {1,2,3}: 2 and 3 tie at score 9 -> smaller id 2 keeps
    assert [d for d in sorted(out) if out[d].is_keeper] == [0, 2, 5]
    assert out[3].cluster_id == 1 and out[3].cluster_size == 3
    # singleton keeps itself regardless of score
    assert out[0].is_keeper and out[0].cluster_size == 1
    # default min-id policy unchanged
    base = {r.doc_id: r.is_keeper
            for r in dedup_clusters(docs, pairs).collect()}
    assert [d for d in sorted(base) if base[d]] == [0, 1, 4]


def test_dedup_clusters_null_score_never_keeper(spark):
    """A NULL score negates to NULL, which sorts FIRST in min(struct) —
    without the coalesce-to-+inf guard a NULL-scored doc silently wins
    the keeper slot. NULL ranks below every real score; an all-NULL
    cluster falls back to the min-id keeper."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, n=None), Row(doc_id=2, n=0.5),
         Row(doc_id=3, n=None), Row(doc_id=4, n=None),
         Row(doc_id=5, n=None)],
        "doc_id long, n double",
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=4, id_b=5)]
    )
    out = {r.doc_id: r for r in
           dedup_clusters(docs, pairs, score_col="n").collect()}
    # cluster {1,2}: scored doc 2 beats NULL-scored doc 1
    assert not out[1].is_keeper and out[2].is_keeper
    # all-NULL cluster {4,5}: min id 4 keeps
    assert out[4].is_keeper and not out[5].is_keeper
    # NULL-scored singleton still keeps itself
    assert out[3].is_keeper
