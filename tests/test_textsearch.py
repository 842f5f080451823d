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


def test_match_query_properties(spark):
    """Algebraic properties over a generated corpus: ALL ⊆ ANY;
    exclusion only removes; score equals the sum of the matched terms'
    tfs computed independently."""
    import random

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    idx = build_inverted_index(df, "doc_id", "text")
    terms, excl = ["w1", "w2", "w3"], ["w4"]
    allq = {r["doc_id"]: r for r in match_query(idx, terms).collect()}
    anyq = {r["doc_id"]: r for r in match_query(idx, terms, mode="any").collect()}
    assert set(allq) <= set(anyq)
    excl_any = {
        r["doc_id"] for r in match_query(idx, terms, mode="any", exclude=excl).collect()
    }
    assert excl_any <= set(anyq)
    # independent scalar recomputation of membership + scores
    for i, text in docs:
        toks = text.split()
        tf = {t: toks.count(t) for t in terms}
        expect_any = any(v > 0 for v in tf.values())
        assert (i in anyq) == expect_any, i
        if expect_any:
            assert anyq[i]["score"] == sum(tf.values()), i
            assert anyq[i]["n_matched"] == sum(v > 0 for v in tf.values()), i
        assert (i in allq) == all(v > 0 for v in tf.values()), i
        if expect_any:
            has_excl = any(t in toks for t in excl)
            assert (i in excl_any) == (not has_excl), i


def test_partitioned_index_prunes(spark, tmp_path):
    """write_inverted_index partitions by first term character; a term
    query must read only the matching partition (PartitionFilters in
    the scan) and return identical results."""
    from fscrawler_spark.operators.textsearch import (
        read_inverted_index,
        write_inverted_index,
    )

    idx = build_inverted_index(_docs(spark), "doc_id", "text")
    p = str(tmp_path / "pidx")
    write_inverted_index(idx, p)
    pidx = read_inverted_index(spark, p)
    got = {(r["doc_id"], r["score"]) for r in term_query(pidx, "spark").collect()}
    want = {(r["doc_id"], r["score"]) for r in term_query(idx, "spark").collect()}
    assert got == want and got
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        term_query(pidx, "spark").explain("formatted")
    plan = buf.getvalue()
    import re

    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and re.search(r"tp#\d+ = s\)|tp#\d+ IN \(s", pf[0]), pf
    # match_query over the partitioned index agrees too
    got_m = {r["doc_id"] for r in match_query(pidx, ["spark", "vector"]).collect()}
    want_m = {r["doc_id"] for r in match_query(idx, ["spark", "vector"]).collect()}
    assert got_m == want_m


def test_tfidf_topk_hand_computed(spark):
    from fscrawler_spark.operators.textsearch import tfidf_topk

    idx = build_inverted_index(_docs(spark), "doc_id", "text")
    got = [
        (r["doc_id"], r["rk"], r["term"], r["tf"], r["df"], r["score"])
        for r in tfidf_topk(idx, n_docs=6, k=3).orderBy("doc_id", "rk").collect()
    ]
    # df: spark 3, vector 3, everything else 1; score = tf*6/df;
    # ties (equal score) break on term ASC.
    assert got == [
        (1, 1, "merge", 1, 1, 6.0),
        (1, 2, "scan", 1, 1, 6.0),
        (1, 3, "spark", 2, 3, 4.0),
        (2, 1, "table", 1, 1, 6.0),
        (2, 2, "spark", 1, 3, 2.0),
        (2, 3, "vector", 1, 3, 2.0),
        (3, 1, "slow", 1, 1, 6.0),
        (3, 2, "vector", 2, 3, 4.0),
        (4, 1, "fast", 1, 1, 6.0),
        (4, 2, "spark", 1, 3, 2.0),
        (4, 3, "vector", 1, 3, 2.0),
    ]


def test_repetition_stats_hand_computed(spark):
    from fscrawler_spark.operators.textsearch import repetition_stats

    docs = _docs(spark).union(
        spark.createDataFrame(
            [(7, "a b c d e f g h i j")], "doc_id int, text string"
        )
    )
    idx = build_inverted_index(docs, "doc_id", "text")
    rows = {r["doc_id"]: r for r in repetition_stats(idx).collect()}
    d1 = rows[1]  # spark spark scan merge
    assert (d1["n_words"], d1["n_uniq"]) == (4, 3)
    assert (d1["top_frac"], d1["dup_frac"], d1["uniq_frac"]) == (0.5, 0.5, 0.75)
    assert d1["keep"] is False  # top_frac 0.5 > 0.10
    d7 = rows[7]  # ten distinct words: passes every rule
    assert (d7["top_frac"], d7["dup_frac"], d7["uniq_frac"]) == (0.1, 0.0, 1.0)
    assert d7["keep"] is True
    assert 5 not in rows and 6 not in rows  # empty/null docs never indexed


def test_hashed_linear_score_reference_and_plan(spark):
    """hashlib/int reference parity + JVM-only plan for the hashed
    linear classifier (functions/textclass.py)."""
    import hashlib
    import re

    from fscrawler_spark.functions.textclass import hashed_linear_score

    def ref(text):
        toks = re.split(r"\s+", text.strip().lower())
        score = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 65536
            score += (b * 2654435761) % 1000 - 500
        return len(toks), score

    rows = [
        (1, "the quick brown fox"),
        (2, "repeated repeated repeated"),
        (3, "unique mixture of several tokens in one line"),
        (4, None),
        (5, "  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = hashed_linear_score(df, "doc_id", "text")
    got = {r["doc_id"]: (r["n_tokens"], r["score"], r["keep"]) for r in out.collect()}
    want = {}
    for i, t in rows:
        if t and t.strip():
            n, s = ref(t)
            want[i] = (n, s, s >= 0)
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_collocations_reference(spark):
    """Counter-based reference on a hand corpus: 'new york' dominates,
    singleton pairs are gated."""
    from collections import Counter

    from fscrawler_spark.operators.textsearch import collocations_topk

    rows = [
        (1, "new york is big and new york is loud"),
        (2, "i love new york more than old york"),
        (3, "totally unrelated words here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["pair"], r["c_pair"], r["score_e6"])
        for r in collocations_topk(df, "doc_id", "text", k=5, min_pair=2).collect()
    ]
    toks = [t.split() for _, t in rows if t]
    cu = Counter(w for ts in toks for w in ts)
    cp = Counter(" ".join(p) for ts in toks for p in zip(ts, ts[1:]))
    want = sorted(
        (
            (p, c, c * c * 1_000_000 // (cu[p.split()[0]] * cu[p.split()[1]]))
            for p, c in cp.items()
            if c >= 2
        ),
        key=lambda r: (-r[2], r[0]),
    )[:5]
    assert got == want
    assert got[0][0] == "new york" and got[0][1] == 3


def test_ngram_lm_scores_reference(spark):
    """Counter-based reference: per-occurrence floor-scaled bigram MLE
    P(w2|w1), per-doc floor mean; sub-2-token docs absent; a doc of
    always-repeated transitions scores the 1e6 ceiling."""
    from collections import Counter

    from fscrawler_spark.operators.textsearch import ngram_lm_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran and the dog sat"),
        (3, "zz zz zz zz"),
        (4, "lonely"),
        (5, None),
        (6, "  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score_e6"])
        for r in ngram_lm_scores(df, "doc_id", "text").collect()
    }
    toks = {i: t.split() for i, t in rows if t and t.strip()}
    cu = Counter(w for ts in toks.values() for w in ts)
    cp = Counter(" ".join(p) for ts in toks.values() for p in zip(ts, ts[1:]))
    want = {}
    for i, ts in toks.items():
        ps = [cp[" ".join(p)] * 1_000_000 // cu[p[0]] for p in zip(ts, ts[1:])]
        if ps:
            want[i] = (len(ps), sum(ps) // len(ps))
    assert got == want
    assert 4 not in got and 5 not in got and 6 not in got
    # c("zz zz") = 3 but c("zz") = 4 (the final token is a prefix with
    # no continuation), so P(zz|zz) = 3/4 — the unsmoothed MLE.
    assert got[3] == (3, 750_000)
    assert got[3][1] > got[1][1]  # repetition outscores varied text


def test_ngram_lm_scores_plan_is_jvm_only(spark):
    from fscrawler_spark.operators.textsearch import ngram_lm_scores

    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    plan = (
        ngram_lm_scores(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_ngram_lm_scores_property_parity(spark):
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fscrawler_spark.operators.textsearch import ngram_lm_scores

    _docs = st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=8),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=_docs)
    def inner(docs):
        rows = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["lm_score_e6"])
            for r in ngram_lm_scores(df, "doc_id", "text").collect()
        }
        toks = {i: ts for i, ts in enumerate(docs) if ts}
        cu = Counter(w for ts in toks.values() for w in ts)
        cp = Counter(" ".join(p) for ts in toks.values() for p in zip(ts, ts[1:]))
        want = {}
        for i, ts in toks.items():
            ps = [cp[" ".join(p)] * 1_000_000 // cu[p[0]] for p in zip(ts, ts[1:])]
            if ps:
                want[i] = (len(ps), sum(ps) // len(ps))
        assert got == want

    inner()
