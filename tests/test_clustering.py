"""Integer-exact k-means (operators/clustering.py): pure-Python Lloyd
reference parity, seed determinism, empty-cluster carry-forward, and
the JVM-only plan assert."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.operators.clustering import kmeans_codes, kmeans_seed_centroids


def _ref_kmeans(vecs: dict[int, list[int]], k: int, iters: int):
    """Pure-Python reference of the exact integer algorithm: md5-order
    seeds, squared-L2 argmin (ties to smallest cluster), floor-mean
    updates, empty clusters keep their previous centroid."""
    ids = sorted(vecs)
    seed_ids = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = {c: list(vecs[i]) for c, i in enumerate(seed_ids)}
    assign, d2s = {}, {}
    for _ in range(iters):
        for i in ids:
            best = min(
                (sum((a - b) ** 2 for a, b in zip(vecs[i], cents[c])), c)
                for c in cents
            )
            d2s[i], assign[i] = best
        for c in cents:
            members = [vecs[i] for i in ids if assign[i] == c]
            if members:
                cents[c] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    prof = {}
    for c in cents:
        members = [i for i in ids if assign[i] == c]
        prof[c] = (
            len(members),
            sum(members),
            sum(cents[c]),
            sum(d2s[i] for i in members),
        )
    return prof


def _codes_df(spark, vecs):
    rows = [
        (i, p, v) for i, vec in vecs.items() for p, v in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "id long, pos int, code int")


@pytest.fixture(scope="module")
def random_vecs():
    # Deterministic "random" integer vectors in the SQ8 code range.
    vecs = {}
    for i in range(60):
        h = hashlib.md5(f"vec{i}".encode()).digest() * 2
        vecs[i] = [b for b in h[:24]]
    return vecs


def test_kmeans_matches_pure_python(spark, random_vecs):
    out = {
        r["cluster"]: (r["n_vecs"], r["sum_ids"], r["centroid_l1"], r["inertia"])
        for r in kmeans_codes(_codes_df(spark, random_vecs), "id", k=5, iters=3).collect()
    }
    assert out == _ref_kmeans(random_vecs, k=5, iters=3)


def test_kmeans_iteration_zero_vs_one_differ(spark, random_vecs):
    df = _codes_df(spark, random_vecs)
    one = {r["cluster"]: r["inertia"] for r in kmeans_codes(df, "id", k=5, iters=1).collect()}
    three = {r["cluster"]: r["inertia"] for r in kmeans_codes(df, "id", k=5, iters=3).collect()}
    # Lloyd's never increases total inertia between assignment rounds.
    assert sum(three.values()) <= sum(one.values())


def test_seed_centroids_are_md5_order(spark):
    vecs = {i: [i, 2 * i] for i in range(10)}
    seeds = kmeans_seed_centroids(_codes_df(spark, vecs), "id", k=3)
    got = {r["cluster"]: r["ccode"] for r in seeds.where(F.col("pos") == 0).collect()}
    ids = sorted(range(10), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
    assert got == {c: ids[c] for c in range(3)}


def test_empty_cluster_keeps_previous_centroid(spark):
    # Two far groups, k=3: at most two clusters can own members, so at
    # least one seed cluster goes empty — its centroid must survive
    # unchanged (profile row present with n_vecs = 0).
    vecs = {i: ([0, 0, 0] if i < 4 else [255, 255, 255]) for i in range(8)}
    rows = kmeans_codes(_codes_df(spark, vecs), "id", k=3, iters=2).collect()
    assert len(rows) == 3
    ref = _ref_kmeans(vecs, k=3, iters=2)
    got = {
        r["cluster"]: (r["n_vecs"], r["sum_ids"], r["centroid_l1"], r["inertia"])
        for r in rows
    }
    assert got == ref
    assert any(n == 0 for n, _, _, _ in got.values())


def test_kmeans_plan_is_jvm_only(spark, random_vecs):
    plan = kmeans_codes(
        _codes_df(spark, random_vecs), "id", k=3, iters=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


# --- Property-based parity (hypothesis) ------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_vecsets = st.lists(
    st.lists(st.integers(min_value=0, max_value=255), min_size=3, max_size=3),
    min_size=4,
    max_size=14,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vs=_vecsets)
def test_kmeans_property_parity(spark, vs):
    vecs = {i: v for i, v in enumerate(vs)}
    k = min(3, len(vecs))
    got = {
        r["cluster"]: (r["n_vecs"], r["sum_ids"], r["centroid_l1"], r["inertia"])
        for r in kmeans_codes(_codes_df(spark, vecs), "id", k=k, iters=2).collect()
    }
    assert got == _ref_kmeans(vecs, k=k, iters=2)
