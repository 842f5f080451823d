"""Sitemap XML source — <urlset>/<sitemapindex> bodies to URL rows.

The crawl-seed source the reference never needed (filesystem roots ARE
its seed list) but a web crawler always has: robots.txt points at
sitemap.xml, whose <url><loc/><lastmod/></url> entries seed the
frontier and whose lastmod drives recrawl scheduling (the q62 diff).

Parsing is pure codegen — one (?s) non-greedy regexp_extract_all per
level, exploded; no XML library, no Python per row (sitemaps are
machine-generated and schema-fixed, so the regex grammar is the
published one: sitemaps.org protocol).  Whitespace inside tags is
tolerated; a missing <lastmod> yields null.  Both extraction regexes
restate 1:1 in DuckDB, so sitemap queries stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_INDEX_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def _nullif_empty(c: Column) -> Column:
    return F.when(c == "", F.lit(None).cast("string")).otherwise(c)


def parse_sitemaps(
    df: DataFrame, xml_col: str = "body", keep_cols: list[str] | None = None
) -> DataFrame:
    """<urlset> bodies -> one row per <url> entry: (*keep_cols, loc,
    lastmod).  Entries without a <loc> are dropped (spec-invalid);
    lastmod is null when absent."""
    keep = keep_cols or []
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
    e = df.select(*keep, F.explode(blocks).alias("_b"))
    loc = F.regexp_extract(F.col("_b"), _LOC, 1)
    return (
        e.select(
            *keep,
            _nullif_empty(loc).alias("loc"),
            _nullif_empty(
                F.regexp_extract(F.col("_b"), _LASTMOD, 1)
            ).alias("lastmod"),
        )
        .where(F.col("loc").isNotNull())
    )


def parse_sitemap_index(
    df: DataFrame, xml_col: str = "body", keep_cols: list[str] | None = None
) -> DataFrame:
    """<sitemapindex> bodies -> one row per child sitemap: (*keep_cols,
    loc, lastmod) — feed the locs back through the fetch stage and then
    into parse_sitemaps (the two-level protocol shape)."""
    keep = keep_cols or []
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_INDEX_BLOCK), 1)
    e = df.select(*keep, F.explode(blocks).alias("_b"))
    loc = F.regexp_extract(F.col("_b"), _LOC, 1)
    return (
        e.select(
            *keep,
            _nullif_empty(loc).alias("loc"),
            _nullif_empty(
                F.regexp_extract(F.col("_b"), _LASTMOD, 1)
            ).alias("lastmod"),
        )
        .where(F.col("loc").isNotNull())
    )
