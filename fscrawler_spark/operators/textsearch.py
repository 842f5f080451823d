"""Inverted-index full-text search (S10) — the Spark-native replacement
for the reference's Elasticsearch sink + queries
(app/elastic_search_client.py:6-37: index document, match query, term
query, exclusion filter).

Instead of shipping crawled text to an external search cluster, the
posting-list table IS a DataFrame: ``build_inverted_index`` explodes
whitespace tokens into (term, doc_id, tf) rows — one shuffle keyed on
(term, doc_id) with map-side partial counts.  Query operators are then
plain semi-/anti-join + aggregate shapes over the index:

  term_query     — ES "term" query: postings of one term
  match_query    — ES "match" with AND/OR semantics over several terms,
                   optional exclusion list (the reference's
                   must_not/exclude clause), tf-sum scoring

Scale shape: the index build is a single hash aggregate (no joins);
query terms are literal IN-lists, so Catalyst pushes them into the
posting scan (partition/row-group pruning on a term-partitioned or
bucketed index table).  Multi-term conjunctions use count-distinct
over matched terms instead of an N-way self-join — one pass, one
aggregate, any number of terms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.functions.textstats import tokens


def build_inverted_index(
    df: DataFrame, id_col: str, text_col: str | Column
) -> DataFrame:
    """Posting-list table (term, doc_id, tf) over whitespace tokens of
    the lower-cased text.  tf = term frequency in the document."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(text))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def write_inverted_index(index: DataFrame, path: str) -> None:
    """Persist the posting table partitioned by the term's first
    character (`tp`): a term query then reads ONE partition directory
    (partition pruning — the at-scale substitute for ES's term
    routing).  At 10^10-document scale the same layout bucket-sorts
    within partitions by (term, doc_id) for row-group skipping."""
    index.withColumn("tp", F.substring("term", 1, 1)).write.mode(
        "overwrite"
    ).partitionBy("tp").parquet(path)


def read_inverted_index(spark, path: str) -> DataFrame:
    """Read back a partitioned posting table; adds the pruning
    predicate helper column transparently."""
    return spark.read.parquet(path)


def _prune(index: DataFrame, terms: list[str]) -> DataFrame:
    """When the index carries the partition column (`tp`), add the
    first-character predicate so Catalyst prunes partitions before the
    term filter (no-op on unpartitioned indexes)."""
    if "tp" in index.columns:
        return index.where(
            F.col("tp").isin(sorted({t[:1] for t in terms if t}))
        )
    return index


def term_query(index: DataFrame, term: str) -> DataFrame:
    """Documents containing `term`, scored by tf
    (elastic_search_client.py term-query analog)."""
    term = term.lower()
    return _prune(index, [term]).where(F.col("term") == term).select(
        "doc_id", F.col("tf").alias("score")
    )


def match_query(
    index: DataFrame,
    terms: list[str],
    mode: str = "all",
    exclude: list[str] | None = None,
) -> DataFrame:
    """Documents matching `terms` (mode="all": every term present;
    mode="any": at least one), minus any document containing a term of
    `exclude` (the ES must_not clause).  Score = total tf over matched
    query terms.  Returns (doc_id, n_matched, score).

    One posting scan + one aggregate for the match side (the IN-list is
    pushed into the scan), one anti-join for the exclusion."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    terms = [t.lower() for t in terms]
    hits = (
        _prune(index, terms)
        .where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_matched"),
            F.sum("tf").cast("long").alias("score"),
        )
    )
    if mode == "all":
        hits = hits.where(F.col("n_matched") == len(terms))
    if exclude:
        excl = [t.lower() for t in exclude]
        banned = (
            _prune(index, excl)
            .where(F.col("term").isin(excl))
            .select("doc_id")
        )
        hits = hits.join(banned, "doc_id", "left_anti")
    return hits
