"""Gap sessionization (operators/sessions.py): pinned merge semantics
— a delta of EXACTLY the gap starts a new session (half-open per-event
window) — plus exact fixed-point outputs and the one-shuffle plan."""

from __future__ import annotations

from datetime import datetime

from fscrawler_spark.operators.sessions import sessionize


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double"
    )


def test_exact_gap_starts_new_session(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 59, 59, 999999), 2.0),  # < gap: merges
        (1, datetime(2024, 1, 1, 2, 0, 0), 4.0),  # exactly 1h later: NEW
        (2, datetime(2024, 1, 1, 0, 0, 0), 8.0),
    ]
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(
            _df(spark, rows), "user_id", "ts", "1 hour", value_col="value"
        ).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["duration_us"] == 3599999999
    assert s11["sum_value_e2"] == 300
    s12 = out[(1, 2)]
    assert s12["n_events"] == 1 and s12["duration_us"] == 0
    # tz-free epoch micros: NTZ wall-clock minus the 1970 epoch
    assert s12["start_us"] == int(
        (datetime(2024, 1, 1, 2, 0, 0) - datetime(1970, 1, 1)).total_seconds()
        * 1_000_000
    )
    assert out[(2, 1)]["sum_value_e2"] == 800


def test_session_seq_orders_by_start(spark):
    rows = [
        (5, datetime(2024, 1, 3, 0, 0, 0), 1.0),
        (5, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (5, datetime(2024, 1, 2, 0, 0, 0), 1.0),
    ]
    out = sessionize(_df(spark, rows), "user_id", "ts", "1 hour").orderBy(
        "session_seq"
    )
    starts = [r["start_us"] for r in out.collect()]
    assert starts == sorted(starts) and len(starts) == 3


def test_sessionize_single_exchange_jvm_only(spark):
    df = _df(spark, [(1, datetime(2024, 1, 1), 1.0)])
    plan = (
        sessionize(df, "user_id", "ts", "1 hour", value_col="value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 1, plan


def test_hopping_window_membership_and_boundary(spark):
    """An event sits in exactly len/slide hopping windows; an event
    exactly on a window start belongs to that window but NOT to the
    window ending there (half-open [start, start+len))."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, datetime(1970, 1, 2, 0, 0, 0))], "id long, ts timestamp_ntz"
    )
    wins = (
        df.groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .count()
        .select("w.start", "w.end")
        .collect()
    )
    assert len(wins) == 4
    starts = sorted(r["start"] for r in wins)
    assert starts[0] == datetime(1970, 1, 1, 6, 0, 0)  # ends 1d+6h > t
    assert starts[-1] == datetime(1970, 1, 2, 0, 0, 0)  # starts AT t


def test_sessionize_empty_input(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp_ntz, value double")
    assert sessionize(df, "user_id", "ts", "1 hour", value_col="value").count() == 0


def test_sessionize_matches_python_reference_random(spark):
    """Random-data cross-check vs a pure-Python gap scanner (the
    third implementation besides the oracle SQL and session_window)."""
    import random
    from datetime import timedelta

    rng = random.Random(3)
    rows = []
    for u in range(12):
        t = datetime(2024, 1, 1)
        for _ in range(rng.randrange(1, 40)):
            t = t + timedelta(seconds=rng.randrange(1, 9000))
            rows.append((u, t, 1.0))
    df = _df(spark, rows)
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(df, "user_id", "ts", "1 hour").collect()
    }
    want = {}
    by_u = {}
    for u, t, _ in rows:
        by_u.setdefault(u, []).append(t)
    epoch = datetime(1970, 1, 1)
    for u, ts in by_u.items():
        ts.sort()
        sess, cur = [], [ts[0]]
        for a, b in zip(ts, ts[1:]):
            if (b - a).total_seconds() >= 3600:
                sess.append(cur)
                cur = [b]
            else:
                cur.append(b)
        sess.append(cur)
        for i, s in enumerate(sess, 1):
            want[(u, i)] = (
                len(s),
                int((s[0] - epoch).total_seconds() * 1_000_000),
                int((s[-1] - epoch).total_seconds() * 1_000_000),
            )
    assert got == want
