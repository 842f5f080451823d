"""Hashed linear text classifier — the fastText-style quality-model
shape (hash tokens into a fixed feature space, dot with a weight
vector, threshold) reduced to pure relational algebra so it runs
JVM-side at corpus scale and oracle-checks digit-exact.

Real pipelines load trained weights as a broadcast table; the sandbox
has no model artifact, so weights are a deterministic integer function
of the bucket id (``w(b) = (b * 2654435761) % 1000 - 500`` — the
Knuth multiplicative constant scrambles adjacent buckets).  The
PLUMBING is the deliverable: explode → hash-bucket → weight → one
map-side-combined sum per document, no Python, no join (a learned
model swaps the weight expression for a broadcast-join against a
weights table without touching the plan shape).

Bucketing uses the first 4 hex chars of md5 (16 bits) parsed as an
integer — portable to any ANSI engine (DuckDB: ``'0x…'::BIGINT``), so
the classifier score is engine-exact int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 65536,
    threshold: int = 0,
) -> DataFrame:
    """Per-document classifier score: sum over token OCCURRENCES (tf
    weighting, the fastText default) of the bucket weight; ``keep``
    is ``score >= threshold``.  Documents with no tokens emit nothing
    (the q43/q44 empty-doc convention).  One explode + one
    map-side-combined hash aggregate; the only shuffle keys on the
    document id."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long")
        % F.lit(int(n_buckets))
    )
    weight = (bucket * F.lit(2654435761)) % F.lit(1000) - F.lit(500)
    return (
        toks.select(id_col, weight.alias("w"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("w").cast("long").alias("score"),
        )
        .withColumn("keep", F.col("score") >= F.lit(int(threshold)))
    )
