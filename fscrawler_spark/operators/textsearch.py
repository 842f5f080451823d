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


def term_query(index: DataFrame, term: str) -> DataFrame:
    """Documents containing `term`, scored by tf
    (elastic_search_client.py term-query analog)."""
    return index.where(F.col("term") == term.lower()).select(
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
        index.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_matched"),
            F.sum("tf").cast("long").alias("score"),
        )
    )
    if mode == "all":
        hits = hits.where(F.col("n_matched") == len(terms))
    if exclude:
        banned = (
            index.where(F.col("term").isin([t.lower() for t in exclude]))
            .select("doc_id")
        )
        hits = hits.join(banned, "doc_id", "left_anti")
    return hits
