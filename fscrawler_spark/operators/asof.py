"""Distributed backward as-of join — "for each probe row, the latest
quote row of the same key with ts <= probe.ts" — the temporal-join
primitive Spark lacks as a built-in (the brief's custom-operator list
names it explicitly; the crawl reading is recrawl attribution: each
fetch joined to the latest earlier snapshot of the same url/host).

Scale shape — the union + carry-forward pattern, NOT an inequality
join: a naive ``a.ts <= b.ts`` theta-join is a per-key cross product
(O(n·m) per key — a hot host with 10^5 fetches and 10^5 snapshots is
10^10 comparisons); a range-bucketed join fixes the blowup but still
double-shuffles.  Instead both sides union into one stream tagged
probe/quote, ONE hash-partition exchange on the key, one sort by
(ts, side), and ``last(quote_payload, ignorenulls=True)`` over the
unbounded-preceding window carries each quote forward to every later
probe.  Cost is sort-merge-like: O((n+m) log(n+m)) per key, one
shuffle, no row amplification.  Skew axis = rows per key, same as any
per-key window.

Semantics (pinned by oracle vs DuckDB's native ASOF JOIN): backward,
inclusive (``quote.ts <= probe.ts``; the quote sorts before the probe
at equal ts).  Ties among quotes at identical (key, ts): the payload
struct's max wins (quotes sort ascending by payload, the carry reads
the last one) — callers wanting a specific rule should pre-dedup, as
q47 does with max(event_id).  Quote payloads ride inside ONE struct
column, so genuinely-NULL payload fields never make ``ignorenulls``
skip a quote row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probes: DataFrame,
    quotes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    probe_cols: list[str],
    quote_cols: list[str],
) -> DataFrame:
    """Left as-of join: one output row per probe row, with ``quote_*``
    columns from the matched quote (NULL when no quote precedes).
    Output columns: key_cols + ts_col + probe_cols + quote_cols."""
    q_tagged = quotes.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in quote_cols]).alias("_q"),
        F.lit(None).cast(
            probes.select(
                F.struct(*[F.col(c) for c in probe_cols]).alias("s")
            ).schema["s"].dataType
        ).alias("_p"),
    )
    p_tagged = probes.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            quotes.select(
                F.struct(*[F.col(c) for c in quote_cols]).alias("s")
            ).schema["s"].dataType
        ).alias("_q"),
        F.struct(*[F.col(c) for c in probe_cols]).alias("_p"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_q").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        q_tagged.unionByName(p_tagged)
        .withColumn("_m", F.last("_q", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return carried.select(
        *key_cols,
        ts_col,
        *[F.col(f"_p.{c}").alias(c) for c in probe_cols],
        *[F.col(f"_m.{c}").alias(c) for c in quote_cols],
    )
