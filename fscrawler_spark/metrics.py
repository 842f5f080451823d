"""Crawl-results analytics — the reference's SQL stats pack and
MetricsObserver reports as DataFrame functions (SURVEY §2.4, §2.6).

Ports (semantics, not code) of:
  - sql/stats.sql:2-6   count by extension        -> count_by_extension
  - sql/stats.sql:9-13  size sum by extension     -> size_by_extension
  - sql/stats.sql:16-33 duplicate detection       -> duplicate_url_groups
  - observers/metrics_observer.py:50-77 top-k dicts (deepest paths,
    biggest dirs, most files, longest paths)      -> top_* functions
  - observers/metrics_observer.py:83-112 final report -> crawl_report
  - observers/empty_directory_observer.py:51-57   -> hosts with nothing
    fetched (the no-content-host analog)

All are plain Catalyst plans: hash aggregates with partial+final
(map-side combine) for the groupBys, TakeOrderedAndProject for the
top-ks — no single-task stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.operators.topk import top_k_per_group


def count_by_extension(results: DataFrame) -> DataFrame:
    """GROUP BY extension ORDER BY count DESC (sql/stats.sql:2-6)."""
    return (
        results.groupBy("extension")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "extension")
    )


def size_by_extension(results: DataFrame) -> DataFrame:
    """GROUP BY extension over sum(size) (sql/stats.sql:9-13)."""
    return (
        results.groupBy("extension")
        .agg(
            F.sum("size").alias("total_bytes"),
            F.count("*").alias("cnt"),
        )
        .orderBy(F.desc("total_bytes"), "extension")
    )


def duplicate_url_groups(results: DataFrame) -> DataFrame:
    """Content-duplicate groups by (md5, size) with members listed —
    the two-step form of data_manager.py:330-359: group, filter >1,
    join back for the URLs (sort_array for determinism)."""
    dups = (
        results.groupBy("md5_hex", "size")
        .agg(F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )
    return (
        results.join(F.broadcast(dups), ["md5_hex", "size"])
        .groupBy("md5_hex", "size", "dup_count")
        .agg(F.sort_array(F.collect_list("url")).alias("urls"))
        .orderBy(F.desc("dup_count"), "md5_hex")
    )


def top_deepest(results: DataFrame, n: int = 10, examples: int = 20) -> DataFrame:
    """Top-n depths with up to `examples` URLs each
    (metrics_observer.py:50-53,114-133: depth->examples dict capped)."""
    per_depth = (
        results.groupBy("depth")
        .agg(
            F.count("*").alias("cnt"),
            F.slice(F.sort_array(F.collect_list("url")), 1, examples).alias("examples"),
        )
        .orderBy(F.desc("depth"))
        .limit(n)
    )
    return per_depth


def top_hosts_by_bytes(results: DataFrame, n: int = 10) -> DataFrame:
    """Biggest hosts (metrics_observer.py:56-59 biggest-dirs analog)."""
    return (
        results.groupBy("host")
        .agg(F.sum("size").alias("total_bytes"), F.count("*").alias("pages"))
        .orderBy(F.desc("total_bytes"), "host")
        .limit(n)
    )


def top_hosts_by_pages(results: DataFrame, n: int = 10) -> DataFrame:
    """Hosts with most pages (metrics_observer.py:62-65 most-files)."""
    return (
        results.groupBy("host")
        .agg(F.count("*").alias("pages"))
        .orderBy(F.desc("pages"), "host")
        .limit(n)
    )


def top_longest_urls(results: DataFrame, n: int = 10) -> DataFrame:
    """Longest URLs (metrics_observer.py:68-71 longest-paths)."""
    return (
        results.select("url", F.length("url").alias("url_len"))
        .orderBy(F.desc("url_len"), "url")
        .limit(n)
    )


def top_rated_per_host(results: DataFrame, k: int = 3) -> DataFrame:
    """Best-rated pages per host (top-k window over the rating
    processor's output, C6)."""
    return top_k_per_group(
        results.where(F.col("rating").isNotNull()),
        ["host"],
        [F.desc("rating"), F.asc("url")],
        k,
    ).select("host", "url", "rating")


def extensions_found_not_crawled(
    frontier_seen: DataFrame, results: DataFrame
) -> DataFrame:
    """Set-minus cross-check (metrics_observer.py:85-90): extensions
    seen in the frontier but never extracted — both directions are one
    `left_anti` each (U1)."""
    from fscrawler_spark.functions.urls import url_extension

    seen_ext = (
        frontier_seen.select(url_extension(F.col("url")).alias("extension"))
        .where(F.col("extension").isNotNull())
        .distinct()
    )
    crawled_ext = (
        results.select("extension").where(F.col("extension").isNotNull()).distinct()
    )
    return seen_ext.join(crawled_ext, "extension", "left_anti").orderBy("extension")


def crawl_report(results: DataFrame, metrics: DataFrame) -> dict:
    """Final statistics block (metrics_observer.py:83-112 /
    file_system_crawler.py:390-397): one driver dict, computed in two
    aggregate jobs."""
    agg = results.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("stage") == "EXTRACTED", 1).otherwise(0)).alias("extracted"),
        F.sum(F.when(F.col("stage") == "ERROR", 1).otherwise(0)).alias("errors"),
        F.sum("size").alias("bytes"),
        F.countDistinct("host").alias("hosts"),
        F.max("depth").alias("max_depth"),
        F.max("wave").alias("waves"),
    ).collect()[0]
    by_metric = {
        r["metric"]: r["total"]
        for r in metrics.groupBy("metric").agg(F.sum("value").alias("total")).collect()
    }
    return {**agg.asDict(), **by_metric}


def distribution_profile(
    df: DataFrame, group_col: str, value_col: str, quantiles=(0.5, 0.9, 0.99)
) -> DataFrame:
    """Per-group EXACT distribution profile: count, min, max, and exact
    interpolated percentiles via Spark's sort-based ``percentile``
    aggregate (not percentile_approx — the approx sketch is
    engine-specific and can't be oracle-checked).  The linear
    interpolation ``v[l] + (h - l) * (v[l+1] - v[l])`` at
    ``h = (n-1) * q`` is the same convention as ANSI
    ``percentile_cont`` / DuckDB ``quantile_cont`` and the arithmetic
    is a single IEEE multiply-add on both engines, so results are
    digit-exact cross-engine (probed on the events fixture).

    Scale: one hash exchange on the group key; the exact sort is
    per-group (bounded by group cardinality x values per group).  At
    100 TB you'd reserve this for grouped profiles where per-group rows
    fit an executor (host-level, type-level) and use
    ``percentile_approx`` for global profiles — the exact form is the
    oracle-able one, so it is what ships here.
    """
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    for q in quantiles:
        aggs.append(
            F.percentile(value_col, q).alias(f"p{int(q * 100):02d}")
        )
    return df.groupBy(group_col).agg(*aggs)


def hist_bin_sql(expr: str, lo: float, hi: float, n_bins: int) -> str:
    """SQL text for the fixed-width histogram bin of ``expr`` over
    [lo, hi): floor((x - lo) / width) clamped to [0, n_bins-1].  All
    literals carry e0 exponents (bare decimals parse as DECIMAL on
    both Spark and DuckDB — the functions/sketch.py lesson), floor is
    unambiguous on IEEE doubles, so the SAME text bins identically on
    both engines (the functions/layout.py shared-text device)."""
    l, h = f"{float(lo)!r}e0", f"{float(hi)!r}e0"
    w = f"(({h} - {l}) / {int(n_bins)}.0e0)"
    raw = f"CAST(floor(({expr} - {l}) / {w}) AS BIGINT)"
    return f"LEAST({int(n_bins) - 1}, GREATEST(0, {raw}))"


def hist_mid_sql(bin_expr: str, lo: float, hi: float, n_bins: int) -> str:
    """SQL text for a bin's midpoint value — the representative the
    histogram quantile reports; same shared-text discipline."""
    l, h = f"{float(lo)!r}e0", f"{float(hi)!r}e0"
    w = f"(({h} - {l}) / {int(n_bins)}.0e0)"
    return f"({l} + (CAST({bin_expr} AS DOUBLE) + 0.5e0) * {w})"


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    qs=((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """Histogram (fixed-bin) quantiles — the GLOBAL-profile scale path
    that distribution_profile's docstring defers to percentile_approx
    for, except oracle-checkable: Spark's approx sketch is
    engine-opaque, while a fixed-width histogram is pure relational
    algebra whose every step is engine-exact.

    The q-quantile is resolved to type-1 (lower) semantics on the
    binned domain: the smallest bin whose cumulative count reaches
    ceil(q*n), with q = num/den rational so the threshold test is the
    INTEGER comparison cum*den >= n*num — no ceil(), no floats.  The
    reported midpoint is within half a bin width of any true
    q-quantile by construction (pytest-bounded against the exact
    percentile).

    Scale: the input collapses to at most n_bins rows per group at the
    first map-side-combined aggregate; the cumsum window orders those
    n_bins rows, never the raw values (the q63 collapsed-domain
    discipline) — vs the exact percentile's full per-group sort.  NULL
    values are excluded (the ANSI aggregate convention); out-of-range
    values clamp to the edge bins.
    """
    from pyspark.sql import Window

    b = df.where(F.col(value_col).isNotNull()).select(
        group_col, F.expr(hist_bin_sql(value_col, lo, hi, n_bins)).alias("bin")
    )
    binc = b.groupBy(group_col, "bin").agg(F.count("*").alias("c"))
    w_cum = Window.partitionBy(group_col).orderBy("bin")
    w_all = Window.partitionBy(group_col)
    cum = binc.select(
        group_col,
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for num, den in qs:
        p = 100 * num // den
        cond = F.when(
            F.col("cum") * F.lit(den) >= F.col("n") * F.lit(num), F.col("bin")
        )
        aggs.append(F.min(cond).cast("long").alias(f"p{p:02d}_bin"))
    res = cum.groupBy(group_col).agg(*aggs)
    cols = [group_col, "n"]
    for num, den in qs:
        p = 100 * num // den
        cols.append(f"p{p:02d}_bin")
        res = res.withColumn(
            f"p{p:02d}_mid", F.expr(hist_mid_sql(f"p{p:02d}_bin", lo, hi, n_bins))
        )
        cols.append(f"p{p:02d}_mid")
    return res.select(*cols)
