"""Deterministic hash sampling + decontamination semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fscrawler_spark.operators.sampling import (
    _hex_threshold,
    hash_sample,
    stratified_hash_sample,
)
from fscrawler_spark.operators.similarity import contaminated_ids


def _ref_keep(key, fraction, salt=""):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()[:8]
    return h < _hex_threshold(fraction)


def test_hex_threshold_edges():
    assert _hex_threshold(0.0) == "00000000"
    assert _hex_threshold(0.25) == "40000000"
    assert _hex_threshold(1.0) == "ffffffff"


def test_hash_sample_matches_hashlib_reference(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    got = {r["k"] for r in hash_sample(df, "k", 0.3, salt="z").collect()}
    want = {i for i in range(2000) if _ref_keep(i, 0.3, "z")}
    assert got == want
    # determinism across partitioning
    got2 = {
        r["k"] for r in hash_sample(df.repartition(13), "k", 0.3, salt="z").collect()
    }
    assert got2 == got
    # roughly the right size (binomial, 2000 draws)
    assert 480 <= len(got) <= 720


def test_hash_sample_salts_are_independent_splits(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    a = {r["k"] for r in hash_sample(df, "k", 0.5, salt="a").collect()}
    b = {r["k"] for r in hash_sample(df, "k", 0.5, salt="b").collect()}
    assert a != b  # different salts draw different samples


def test_stratified_fractions_per_stratum(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_hash_sample(
        df, "lang", "k", {"en": 0.2}, default_fraction=1.0
    ).collect()
    got = {(r["k"], r["lang"]) for r in out}
    want = {
        (i, lang)
        for i, lang in rows
        if _ref_keep(i, 0.2 if lang == "en" else 1.0)
    }
    assert got == want
    # every 'de' row kept (fraction 1.0)
    assert sum(1 for _, l in got if l == "de") == 500


def test_stratified_sample_filter_is_pushed_to_scan(spark, tmp_path):
    """The sampling predicate must stay a data filter (no UDF, no
    shuffle) so it evaluates at the scan."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, "en") for i in range(100)], "k long, lang string"
    ).write.parquet(p)
    out = stratified_hash_sample(
        spark.read.parquet(p), "lang", "k", {"en": 0.5}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contaminated_ids_hand_corpus(spark):
    shared = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [
            (1, f"{shared} plus trailing junk"),
            (2, "totally unrelated words in this training document here"),
            (3, f"prefix text {shared}"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, f"benchmark question mentions {shared} verbatim")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in contaminated_ids(train, test, "doc_id", "text", n=8).collect()}
    assert got == {1, 3}


def test_hash_split_disjoint_exhaustive_stable(spark):
    """Every row gets exactly one label, proportions are near the
    requested fractions, and relabeling with the same salt is
    byte-stable while a different salt reshuffles."""
    from fscrawler_spark.operators.sampling import hash_split

    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    out = hash_split(df, "k", fr, salt="s1").collect()
    labels = {r["k"]: r["split"] for r in out}
    assert all(v in fr for v in labels.values())  # no NULLs in practice
    counts = {n: sum(1 for v in labels.values() if v == n) for n in fr}
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["valid"] / 4000 - 0.1) < 0.02
    again = {
        r["k"]: r["split"]
        for r in hash_split(df, "k", fr, salt="s1").collect()
    }
    assert again == labels
    other = {
        r["k"]: r["split"]
        for r in hash_split(df, "k", fr, salt="s2").collect()
    }
    assert other != labels


def test_hash_split_rejects_oversum():
    import pytest as _pytest

    from fscrawler_spark.operators.sampling import hash_split

    with _pytest.raises(ValueError):
        hash_split(None, "k", {"a": 0.7, "b": 0.5})
