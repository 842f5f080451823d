"""robots.txt parsing — raw per-host robots bodies -> the engine's
rules table (host, path_prefix, allow, crawl_delay_tokens).

The reference gates traversal with a gitignore-style deny-list file
(app/config/.crawlerignore, wired via crawler_config.yaml); the web
analog is robots.txt.  This parser is deliberately the protocol's
useful core (original REP, as crawled-at-scale pipelines apply it):

  - grouped records: one or more User-agent lines followed by rules
  - a group applies to us if any of its agents is '*' or equals ours
  - Disallow/Allow with prefix paths ('' Disallow = allow all)
  - Crawl-delay: seconds -> politeness tokens (budget = max(1,
    ceil(window / delay)) for a 60s wave window)

All Column expressions — posexplode lines + a running section id via a
window over (host, line order); no Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WAVE_WINDOW_SECONDS = 60  # politeness tokens = one wave's worth of fetches


def parse_robots(
    robots_txt: DataFrame, agent: str = "fscrawler", wave_window: int = WAVE_WINDOW_SECONDS
) -> DataFrame:
    """robots_txt(host string, body string) -> rules rows matching
    fscrawler_spark.schemas.ROBOTS.

    Hosts with no applicable group (or no body) produce no rows — the
    engine's default (allow all, default budget) applies.
    """
    lines = robots_txt.select(
        "host",
        F.posexplode(F.split(F.coalesce(F.col("body"), F.lit("")), "\n")).alias(
            "pos", "raw"
        ),
    )
    cleaned = lines.select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    parsed = cleaned.select(
        "host",
        "pos",
        F.lower(F.regexp_extract(F.col("line"), r"^([A-Za-z-]+)\s*:", 1)).alias("dir"),
        F.trim(F.regexp_extract(F.col("line"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1)).alias(
            "val"
        ),
    ).where(F.col("dir") != "")

    w = Window.partitionBy("host").orderBy("pos")
    # a new group starts at a User-agent line NOT preceded by another
    # User-agent line (REP: consecutive UA lines share one group)
    is_ua = F.col("dir") == "user-agent"
    prev_ua = F.lag(is_ua.cast("int"), 1, 0).over(w)
    section = F.sum(
        (is_ua & (prev_ua == 0)).cast("int")
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    parsed = parsed.withColumn("section", section)

    # which sections apply to us
    ua_sections = (
        parsed.where(is_ua)
        .groupBy("host", "section")
        .agg(
            F.max(
                (F.col("val") == "*")
                | (F.lower(F.col("val")) == agent.lower())
            ).alias("applies")
        )
        .where(F.col("applies"))
        .select("host", "section")
    )
    rules = parsed.join(ua_sections, ["host", "section"], "left_semi").where(~is_ua)

    allow_deny = rules.where(
        F.col("dir").isin("allow", "disallow") & (F.col("val") != "")
    ).select(
        "host",
        F.col("val").alias("path_prefix"),
        (F.col("dir") == "allow").alias("allow"),
        F.lit(None).cast("int").alias("crawl_delay_tokens"),
    )
    delays = (
        rules.where((F.col("dir") == "crawl-delay") & F.col("val").rlike(r"^\d+(\.\d+)?$"))
        .groupBy("host")
        .agg(F.max(F.col("val").cast("double")).alias("delay"))
        .select(
            "host",
            F.lit("/").alias("path_prefix"),
            F.lit(True).alias("allow"),
            F.greatest(
                F.lit(1), F.floor(F.lit(wave_window) / F.col("delay"))
            ).cast("int").alias("crawl_delay_tokens"),
        )
    )
    return allow_deny.unionByName(delays)


def extract_sitemap_urls(robots_txt: DataFrame, body_col: str = "body") -> DataFrame:
    """(host, loc) per ``Sitemap:`` directive in raw robots bodies —
    the discovery hop that connects robots fetching to the sitemap
    source (sources/sitemap.py): robots lists the archives, the
    sitemaps list the URLs, the frontier seeds from both.

    Per the sitemaps.org protocol the directive is GLOBAL — valid
    anywhere in the file, outside any User-agent group — so this
    deliberately skips the section machinery above: comment-strip,
    case-insensitive match, trim; duplicates dropped.  Pure codegen
    (split + regexp per line), SQL-mirrorable (q92's oracle).
    """
    lines = robots_txt.select(
        "host",
        F.explode(F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")).alias(
            "raw"
        ),
    )
    loc = F.trim(
        F.regexp_extract(
            F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")),
            r"(?i)^sitemap\s*:\s*(.*)$",
            1,
        )
    )
    return (
        lines.select("host", loc.alias("loc"))
        .where(F.col("loc") != "")
        .distinct()
    )
