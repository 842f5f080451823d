"""Subtree rollup (A1) — the recursive directory-size aggregation,
Spark-first.

The reference accumulates subtree sizes up its recursion
(app/crawler/file_system_crawler.py:486-488: dir size = sum of child
sizes, files_in_dir = sum of child counts; same in
app/fast_crawler.py:219-220,244-245).  A parallel engine replaces the
recursion with ONE pass: explode every URL into all of its path
prefixes, then a single hash aggregate per prefix gives every subtree's
total simultaneously — no iteration, no driver-side tree.

Cost model: rows x avg_depth exploded rows through one shuffle; at
10^10 URLs x depth~5 that is a 5x-fanout aggregate with map-side
partial combine — still one shuffle, and skew concentrates on short
prefixes (the host roots), which is exactly what partial aggregation
absorbs (every mapper pre-sums its local share of each prefix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.functions.urls import url_host, url_path


def url_prefixes(url: Column) -> Column:
    """All ancestor prefixes of a URL including itself and the host root:
    http://h/a/b -> [http://h, http://h/a, http://h/a/b].
    Pure Column expression (aggregate over the split path)."""
    host = F.concat(
        F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*://[^/]+)", 1)
    )
    path = F.regexp_replace(url_path(url), r"^/+|/+$", "")
    segs = F.when(path == "", F.array().cast("array<string>")).otherwise(
        F.split(path, "/+")
    )
    # running prefixes: aggregate with an array accumulator
    return F.aggregate(
        segs,
        F.array(host),
        lambda acc, seg: F.concat(
            acc, F.array(F.concat(F.element_at(acc, -1), F.lit("/"), seg))
        ),
    )


def subtree_rollup(
    df: DataFrame, url_col: str = "url", size_col: str = "size"
) -> DataFrame:
    """Every subtree's (total_bytes, n_pages) in one pass:
    explode(prefixes) -> groupBy(prefix).agg(sum, count).

    Returns (prefix, host, depth, total_bytes, n_pages) — the analog of
    the reference's per-directory (size, files_in_dir) for EVERY
    directory at once."""
    exploded = df.select(
        F.explode(url_prefixes(F.col(url_col))).alias("prefix"),
        F.col(size_col).alias("_sz"),
    )
    agg = exploded.groupBy("prefix").agg(
        F.sum("_sz").alias("total_bytes"), F.count("*").alias("n_pages")
    )
    from fscrawler_spark.functions.urls import url_depth

    return agg.select(
        "prefix",
        url_host(F.col("prefix")).alias("host"),
        url_depth(F.col("prefix")).alias("depth"),
        "total_bytes",
        "n_pages",
    )
