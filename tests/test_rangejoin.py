"""Bucketed range join (operators/rangejoin.py): brute-force parity on
random intervals, inclusive bounds, wide-interval coverage, and the
equi-join (never nested-loop) plan guarantee."""

from __future__ import annotations

import random

from fscrawler_spark.operators.rangejoin import interval_point_join


def test_range_join_matches_brute_force(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 1000)) for i in range(120)]
    ivs = []
    for j in range(60):
        lo = rng.randrange(0, 1000)
        ivs.append((j, lo, lo + rng.randrange(0, 40)))
    p = spark.createDataFrame(pts, "pid long, x long")
    v = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    got = {
        (r["pid"], r["iid"])
        for r in interval_point_join(p, v, "x", "lo", "hi", 40).collect()
    }
    want = {
        (pid, iid)
        for pid, x in pts
        for iid, lo, hi in ivs
        if lo <= x <= hi
    }
    assert got == want


def test_range_join_inclusive_bounds_and_left(spark):
    p = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 21), (4, 9)], "pid long, x long"
    )
    v = spark.createDataFrame([(7, 10, 20)], "iid long, lo long, hi long")
    rows = interval_point_join(p, v, "x", "lo", "hi", 16, how="left").collect()
    by_pid = {r["pid"]: r["iid"] for r in rows}
    assert by_pid == {1: 7, 2: 7, 3: None, 4: None}
    assert len(rows) == 4


def test_range_join_interval_wider_than_bucket(spark):
    p = spark.createDataFrame([(i, i * 10) for i in range(30)], "pid long, x long")
    v = spark.createDataFrame([(1, 5, 250)], "iid long, lo long, hi long")
    got = {
        r["pid"]
        for r in interval_point_join(p, v, "x", "lo", "hi", 16).collect()
    }
    assert got == {i for i in range(30) if 5 <= i * 10 <= 250}


def test_range_join_plan_is_equi_join(spark):
    p = spark.createDataFrame([(1, 10)], "pid long, x long")
    v = spark.createDataFrame([(7, 10, 20)], "iid long, lo long, hi long")
    plan = (
        interval_point_join(p, v, "x", "lo", "hi", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan
    assert any(
        k in plan for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan
