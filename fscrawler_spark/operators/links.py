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


def anchor_text_rollup(
    edges: DataFrame, dst_col: str = "dst", anchor_col: str = "anchor"
) -> DataFrame:
    """Anchor-text aggregation per link target — the link-text index a
    crawl feeds to ranking/indexing (anchor terms describe the TARGET
    better than its own page text; the classic web-search signal).
    The reference scrapes hrefs but never aggregates them
    (ContentProcessor pipeline stops at link expansion); a web-scale
    tier always does.

    Per target: in-degree, distinct anchor count, and the top anchor
    by (count desc, anchor asc) — a total order, so the result is
    deterministic and engine-exact.

    Shape: one map-side-combined count on (dst, anchor) — the raw
    edge volume collapses to the distinct-anchor domain before any
    window — then one window pass keyed on dst computes the rank,
    in-degree and anchor count together (three functions, one
    partitioning).  The second exchange moves only the collapsed
    rows.  Hot targets (the skew axis: every page links the homepage)
    are bounded by their distinct-anchor vocabulary, not their
    in-degree, exactly because the count collapses first.
    """
    from pyspark.sql import Window

    pa = edges.groupBy(dst_col, anchor_col).agg(F.count("*").cast("long").alias("c"))
    w_rk = Window.partitionBy(dst_col).orderBy(
        F.col("c").desc(), F.col(anchor_col).asc()
    )
    w_all = Window.partitionBy(dst_col)
    rk = pa.select(
        dst_col,
        anchor_col,
        "c",
        F.row_number().over(w_rk).alias("_r"),
        F.sum("c").over(w_all).cast("long").alias("in_degree"),
        F.count("*").over(w_all).cast("long").alias("n_anchors"),
    )
    return rk.where(F.col("_r") == 1).select(
        dst_col,
        "in_degree",
        "n_anchors",
        F.col(anchor_col).alias("top_anchor"),
        F.col("c").alias("top_anchor_n"),
    )
