"""Backward as-of join (operators/asof.py): boundary/tie semantics vs
a hand reference and vs DuckDB's native ASOF JOIN shape, plus the
one-shuffle plan guarantee."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fscrawler_spark.operators.asof import asof_join_backward


def _ts(m):
    return datetime(2024, 1, 1, 0, m, 0)


def test_asof_inclusive_backward_semantics(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts(10), 100),
            (1, _ts(20), 101),
            (2, _ts(5), 200),
        ],
        "k long, ts timestamp_ntz, qid long",
    )
    probes = spark.createDataFrame(
        [
            (1, _ts(9), 900),   # before any quote -> NULL
            (1, _ts(10), 901),  # equal ts -> inclusive match 100
            (1, _ts(15), 902),  # between -> 100
            (1, _ts(25), 903),  # after both -> 101
            (2, _ts(6), 904),   # -> 200
            (3, _ts(6), 905),   # key with no quotes -> NULL
        ],
        "k long, ts timestamp_ntz, pid long",
    )
    out = {
        r["pid"]: r["qid"]
        for r in asof_join_backward(
            probes, quotes, ["k"], "ts", ["pid"], ["qid"]
        ).collect()
    }
    assert out == {900: None, 901: 100, 902: 100, 903: 101, 904: 200, 905: None}


def test_asof_tie_among_quotes_takes_max_payload(spark):
    quotes = spark.createDataFrame(
        [(1, _ts(10), 7), (1, _ts(10), 9), (1, _ts(10), 8)],
        "k long, ts timestamp_ntz, qid long",
    )
    probes = spark.createDataFrame(
        [(1, _ts(11), 1)], "k long, ts timestamp_ntz, pid long"
    )
    [row] = asof_join_backward(
        probes, quotes, ["k"], "ts", ["pid"], ["qid"]
    ).collect()
    assert row["qid"] == 9


def test_asof_null_quote_payload_field_still_matches(spark):
    """A quote whose payload FIELD is NULL must still win (the struct
    wrapper keeps ignorenulls from skipping the row)."""
    quotes = spark.createDataFrame(
        [(1, _ts(10), 100, None), (1, _ts(5), 99, 5.0)],
        "k long, ts timestamp_ntz, qid long, extra double",
    )
    probes = spark.createDataFrame(
        [(1, _ts(11), 1)], "k long, ts timestamp_ntz, pid long"
    )
    [row] = asof_join_backward(
        probes, quotes, ["k"], "ts", ["pid"], ["qid", "extra"]
    ).collect()
    assert row["qid"] == 100 and row["extra"] is None


def test_asof_plan_one_exchange_jvm_only(spark):
    quotes = spark.createDataFrame(
        [(1, _ts(10), 100)], "k long, ts timestamp_ntz, qid long"
    )
    probes = spark.createDataFrame(
        [(1, _ts(11), 1)], "k long, ts timestamp_ntz, pid long"
    )
    plan = (
        asof_join_backward(probes, quotes, ["k"], "ts", ["pid"], ["qid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 1, plan
    assert "Join" not in plan  # carry-forward, not an inequality join


def test_asof_null_ts_probe_matches_nothing(spark):
    """A probe with NULL ts sorts NULLS FIRST (before every quote), so
    it carries no match — pinned so the behavior is deliberate."""
    quotes = spark.createDataFrame(
        [(1, _ts(10), 100)], "k long, ts timestamp_ntz, qid long"
    )
    probes = spark.createDataFrame(
        [(1, None, 1), (1, _ts(11), 2)], "k long, ts timestamp_ntz, pid long"
    )
    out = {
        r["pid"]: r["qid"]
        for r in asof_join_backward(
            probes, quotes, ["k"], "ts", ["pid"], ["qid"]
        ).collect()
    }
    assert out == {1: None, 2: 100}


def test_asof_matches_pandas_merge_asof(spark):
    """Third-implementation cross-check: random tables vs
    pandas.merge_asof(direction='backward') — unique quote timestamps
    per key so tie rules can't diverge."""
    import random

    import pandas as pd

    rng = random.Random(99)
    quotes, probes, seen = [], [], set()
    for j in range(300):
        k = rng.randrange(5)
        t = rng.randrange(100000)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        quotes.append((k, _ts(0).replace(second=0, microsecond=t * 10), j))
    for i in range(400):
        k = rng.randrange(6)  # includes a quote-less key
        t = rng.randrange(100000)
        probes.append((k, _ts(0).replace(second=0, microsecond=t * 10), i))
    qdf = spark.createDataFrame(quotes, "k long, ts timestamp_ntz, qid long")
    pdf = spark.createDataFrame(probes, "k long, ts timestamp_ntz, pid long")
    got = {
        r["pid"]: r["qid"]
        for r in asof_join_backward(pdf, qdf, ["k"], "ts", ["pid"], ["qid"]).collect()
    }
    pq = pd.DataFrame(quotes, columns=["k", "ts", "qid"]).sort_values("ts")
    pp = pd.DataFrame(probes, columns=["k", "ts", "pid"]).sort_values("ts")
    m = pd.merge_asof(pp, pq, on="ts", by="k", direction="backward")
    want = {
        int(r.pid): (None if pd.isna(r.qid) else int(r.qid))
        for r in m.itertuples()
    }
    assert got == want
