"""Connected components (alternating large/small-star) vs a
pure-Python union-find reference, plus the dedup-cluster composition."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.operators.graph import connected_components, dedup_clusters


def _union_find(edges):
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
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["id"], r["component"])
        for r in connected_components(df, "src", "dst").collect()
    }


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(4):
        n = rng.choice([30, 120])
        m = rng.randint(n // 2, 3 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        want = {(k, v) for k, v in _union_find(edges).items()}
        assert _cc(spark, edges) == want, f"trial {trial}"


def test_cc_long_chain_needs_multiple_rounds(spark):
    # a descending path 99-98-...-0: worst case for naive propagation,
    # exercises >1 alternation round
    edges = [(i + 1, i) for i in range(99)]
    assert _cc(spark, edges) == {(i, 0) for i in range(1, 100)} | {(0, 0)}


def test_cc_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (7, 7)]
    assert _cc(spark, edges) == {(2, 2), (3, 2)}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df, "src", "dst").count() == 0


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "src string, dst string"
    )
    got = {
        (r["id"], r["component"])
        for r in connected_components(df, "src", "dst").collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_dedup_clusters_singletons_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "id_a long, id_b long"
    )
    got = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(docs, "doc_id", pairs).collect()
    }
    assert got == {
        (0, 0, True),
        (1, 1, True), (4, 1, False), (6, 1, False),
        (2, 2, True), (3, 2, False),
        (5, 5, True), (7, 7, True),
    }


def test_cc_plan_is_jvm_side(spark):
    """No Python UDF anywhere in the CC plan — pure DataFrame ops."""
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = connected_components(df, "src", "dst")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
