"""Link expansion — the only table-function shape in the engine
(SURVEY §2.10): 1 fetched page -> N outlinks.

Pipeline: pandas-UDF href scrape (Arrow-batched regex findall) ->
``explode`` -> JVM-side resolve/normalize Column expressions
(functions/urls.py) -> per-URL combine.  This is the web analog of
``Path.iterdir()`` producing children (file_system_crawler.py:482-488).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.functions.extract import extract_hrefs_udf
from fscrawler_spark.functions.urls import url_host, url_normalize, url_resolve


def expand_links(fetched: DataFrame) -> DataFrame:
    """fetched(url, html, depth, seed_id, ...) -> candidate child rows.
    Runs the href-scrape UDF then delegates to ``expand_from_hrefs``."""
    return expand_from_hrefs(
        fetched.withColumn("hrefs", extract_hrefs_udf(F.col("html")))
    )


def expand_from_hrefs(fetched: DataFrame) -> DataFrame:
    """fetched(url, hrefs, depth, seed_id, ...) -> candidate child rows
    (url, host, depth, priority, seed_id), one per distinct resolved
    outlink, combined deterministically across parents.  Takes a
    pre-scraped ``hrefs`` array so the extraction UDF runs exactly once
    per fetched page even when results and expansion both consume it.

    Combine rule: a URL discovered from several parents keeps the
    lexicographically-min (depth, priority, seed_id) struct — the
    earliest/shallowest discovery, mirroring the simulator (SURVEY §7.3).
    """
    hrefs = fetched.select(
        F.col("url").alias("base_url"),
        F.col("depth").alias("parent_depth"),
        F.col("seed_id"),
        F.explode(F.col("hrefs")).alias("href"),
    )
    resolved = hrefs.select(
        url_normalize(url_resolve(F.col("base_url"), F.col("href"))).alias("url"),
        F.col("parent_depth"),
        F.col("seed_id"),
    ).where(F.col("url").isNotNull() & F.col("url").rlike(r"^https?://"))

    child_depth = (F.col("parent_depth") + 1).cast("int")
    candidates = resolved.select(
        "url",
        url_host(F.col("url")).alias("host"),
        child_depth.alias("depth"),
        child_depth.alias("priority"),  # BFS priority = depth (shallow first)
        "seed_id",
    )
    # Deterministic per-URL combine (struct min = lexicographic min).
    combined = candidates.groupBy("url", "host").agg(
        F.min(F.struct("depth", "priority", "seed_id")).alias("_m")
    )
    return combined.select(
        "url",
        "host",
        F.col("_m.depth").alias("depth"),
        F.col("_m.priority").alias("priority"),
        F.col("_m.seed_id").alias("seed_id"),
    )
