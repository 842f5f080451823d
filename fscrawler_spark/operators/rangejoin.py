"""Distributed range (interval) join — "which points fall inside which
intervals" — the second temporal-join primitive from the brief's
custom-operator list (as-of join is operators/asof.py).  Crawl
reading: attribute fetch events to incident/maintenance windows, or
count concurrent fetches inside each host's politeness window.

Scale shape — bucketed equi-join, NOT a theta join: Spark compiles
``lo <= x AND x <= hi`` to BroadcastNestedLoopJoin (O(n·m) row
comparisons; undriveable when neither side broadcasts).  Instead pick
a bucket width ``B >= max interval width``; every interval overlaps at
most 2 buckets (explode to ⌈(hi-lo)/B⌉+1 <= 2 rows), every point has
exactly 1 bucket, equi-join on the bucket id, then the exact
``lo <= x <= hi`` filter.  Because a point's bucket is unique, a
(point, interval) pair meets at most once — no post-join dedup.  Cost:
one shuffle keyed on the bucket, ~2x interval row amplification,
candidate set bounded by per-bucket density instead of |points|·|intervals|.
Skew axis = points per bucket; time-keyed workloads are uniform by
construction, otherwise compose the bucket with a salt or entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    x_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row (``x_col``: int64) to every interval row
    with ``lo_col <= x <= hi_col`` (both int64, inclusive).  Pick
    ``bucket_width`` >= the typical interval width: the bucket sequence
    covers arbitrarily wide intervals correctly, they just amplify into
    more bucket rows (width/B + 1 each).  Output: all point columns +
    all interval columns (NULLs for unmatched points when
    ``how='left'``)."""
    b = F.lit(int(bucket_width)).cast("long")
    pts = points.withColumn("_pb", F.floor(F.col(x_col) / b))
    ivs = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b)
            )
        ),
    )
    cond = (
        (pts["_pb"] == ivs["_ib"])
        & (ivs[lo_col] <= pts[x_col])
        & (pts[x_col] <= ivs[hi_col])
    )
    joined = pts.join(ivs, cond, how)
    return joined.drop("_pb", "_ib")
