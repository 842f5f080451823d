"""Gap-based sessionization — the batch form of Structured Streaming's
session windows, used here as the host-visit/burst analyzer a crawl
scheduler feeds from (per-host fetch sessions = bursts separated by
politeness idle gaps; the reference's crawl loop has no notion of time,
so this is a generalization, not a port).

Spark-first shape: the NATIVE ``F.session_window`` aggregate in batch
mode (Spark >= 3.2) does the gap-merge inside the aggregation operator
itself — one hash-partition exchange on the entity key, then
``UpdatingSessions`` merges sorted events in place; no self-join, no
lag/cumsum double window pass.  The follow-up ``row_number`` that
numbers each entity's sessions reuses the same partitioning (subset
clustering), so the whole operator is ONE shuffle end-to-end at any
scale, and per-entity row counts bound the skew axis.

Session semantics (pinned by test + oracle): each event opens the
half-open interval ``[ts, ts+gap)``; overlapping intervals merge.  Two
consecutive events belong to the same session iff ``delta < gap`` —
a delta of EXACTLY ``gap`` starts a new session.

All outputs are exact int64 (epoch micros, counts, centi-units of
``value``) so any ANSI engine reproduces them digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "6 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Per-``key_col`` gap sessions over ``ts_col``; returns one row per
    session: (key, session_seq, n_events, start_us, end_us, duration_us
    [, sum_value_e2]).  ``session_seq`` is 1-based in session start
    order — stable because session starts are distinct by construction
    (two sessions of one key cannot share a start timestamp)."""
    # Epoch micros computed timezone-free: the driver tables carry
    # TIMESTAMP_NTZ (unix_micros rejects it, and a cast to TIMESTAMP
    # would silently re-interpret in the session zone).
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def _us(c):
        return F.timestamp_diff("MICROSECOND", epoch, c)

    aggs = [
        F.count("*").cast("long").alias("n_events"),
        _us(F.min(ts_col)).alias("start_us"),
        _us(F.max(ts_col)).alias("end_us"),
        (_us(F.max(ts_col)) - _us(F.min(ts_col))).alias("duration_us"),
    ]
    if value_col is not None:
        # centi-unit fixed point: the double multiply + half-up round is
        # IEEE-identical across engines, and the int64 sum is
        # partition-order-independent (the q42 integer-exactness recipe).
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100, 0).cast("long"))
            .cast("long")
            .alias("sum_value_e2")
        )
    per_session = df.groupBy(
        F.col(key_col), F.session_window(F.col(ts_col), gap).alias("sw")
    ).agg(*aggs)
    seq = Window.partitionBy(key_col).orderBy(F.col("sw.start"))
    return per_session.select(
        key_col,
        F.row_number().over(seq).cast("long").alias("session_seq"),
        "n_events",
        "start_us",
        "end_us",
        "duration_us",
        *(["sum_value_e2"] if value_col is not None else []),
    )
