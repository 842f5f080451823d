"""Inverted-index search semantics (S10 — the reference's ES queries
re-expressed as posting-table operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fscrawler_spark.operators.textsearch import (
    build_inverted_index,
    match_query,
    term_query,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark scan merge spark"),
            (2, "Spark VECTOR table"),
            (3, "vector vector slow"),
            (4, "spark vector fast"),
            (5, ""),
            (6, None),
        ],
        "doc_id int, text string",
    )


def test_index_postings_and_tf(spark):
    idx = build_inverted_index(_docs(spark), "doc_id", "text")
    rows = {(r["term"], r["doc_id"]): r["tf"] for r in idx.collect()}
    assert rows[("spark", 1)] == 2  # tf counts repeats
    assert rows[("spark", 2)] == 1  # case-folded
    assert not any(d in (5, 6) for (_, d) in rows), "empty/null docs index nothing"


def test_term_query(spark):
    idx = build_inverted_index(_docs(spark), "doc_id", "text")
    got = {(r["doc_id"], r["score"]) for r in term_query(idx, "Spark").collect()}
    assert got == {(1, 2), (2, 1), (4, 1)}


def test_match_all_any_exclude(spark):
    idx = build_inverted_index(_docs(spark), "doc_id", "text")
    allq = {r["doc_id"] for r in match_query(idx, ["spark", "vector"]).collect()}
    assert allq == {2, 4}
    anyq = {
        r["doc_id"]
        for r in match_query(idx, ["spark", "vector"], mode="any").collect()
    }
    assert anyq == {1, 2, 3, 4}
    # ES must_not clause: doc 3 contains 'slow'
    excl = {
        r["doc_id"]
        for r in match_query(
            idx, ["spark", "vector"], mode="any", exclude=["slow"]
        ).collect()
    }
    assert excl == {1, 2, 4}
    # score is total tf over matched query terms
    s = {r["doc_id"]: r["score"] for r in match_query(idx, ["spark"], mode="any").collect()}
    assert s[1] == 2


def test_query_terms_pushed_into_scan(spark, tmp_path):
    """The IN-list must reach the posting scan as a pushed filter so a
    term-partitioned/bucketed index prunes (scale contract)."""
    idx = build_inverted_index(_docs(spark), "doc_id", "text")
    p = str(tmp_path / "idx.parquet")
    idx.write.parquet(p)
    import io
    from contextlib import redirect_stdout

    q = match_query(spark.read.parquet(p), ["spark", "vector"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    assert "In(term, [spark,vector])" in buf.getvalue()
