"""Staged pipeline (D2) + upsert (S8) + content-family mapping (C3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fscrawler_spark.functions.extract import extract_text_py, md5_hex_py
from fscrawler_spark.functions.urls import content_family, format_size, mime_type
from fscrawler_spark.plans.stages import standard_pipeline, upsert_by_key


def test_standard_pipeline_advances_and_contains_errors(spark):
    rows = [
        ("http://h/x.html", b"<p>hello</p>", "CRAWLED"),
        ("http://h/y.pdf", b"<b>doc</b>", "CRAWLED"),
        ("http://h/broken", None, "CRAWLED"),       # fails hash step
        ("http://h/done.txt", b"<i>z</i>", "INDEXED"),  # untouched
    ]
    df = spark.createDataFrame(rows, "url string, html binary, stage string")
    out = {r["url"]: r for r in standard_pipeline(df).collect()}

    assert out["http://h/x.html"]["stage"] == "INDEXED"
    assert out["http://h/x.html"]["md5_hex"] == md5_hex_py(b"<p>hello</p>")
    assert out["http://h/x.html"]["text"] == extract_text_py(b"<p>hello</p>")
    assert out["http://h/y.pdf"]["extension"] == "pdf"
    # error containment: tagged, not dropped (D4)
    assert out["http://h/broken"]["stage"] == "ERROR"
    # rows at other stages pass through untouched
    assert out["http://h/done.txt"]["stage"] == "INDEXED"
    assert out["http://h/done.txt"]["md5_hex"] is None


def test_upsert_by_key(spark):
    existing = spark.createDataFrame(
        [("u1", 1, "old"), ("u2", 2, "old")], "url string, v int, src string"
    )
    updates = spark.createDataFrame(
        [("u2", 20, "new"), ("u3", 30, "new")], "url string, v int, src string"
    )
    got = {r["url"]: (r["v"], r["src"]) for r in upsert_by_key(existing, updates, "url").collect()}
    assert got == {"u1": (1, "old"), "u2": (20, "new"), "u3": (30, "new")}


def test_mime_and_content_family(spark):
    cases = [
        ("http://h/a.mp3", "audio/mpeg", "AUDIO"),
        ("http://h/a.mp4", "video/mp4", "VIDEO"),
        ("http://h/a.png", "image/png", "PICTURE"),
        ("http://h/a.html", "text/html", "DOCUMENT"),
        ("http://h/a.pdf", "application/pdf", "DOCUMENT"),
        ("http://h/a.zip", "application/zip", "ARCHIVE"),
        ("http://h/a.unknownext", None, None),
        ("http://h/noext", None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    m = mime_type(F.col("url"))
    got = df.select("url", m.alias("mime"), content_family(m).alias("fam")).collect()
    expect = {u: (mm, fam) for u, mm, fam in cases}
    for r in got:
        assert (r["mime"], r["fam"]) == expect[r["url"]], r["url"]


def test_format_size(spark):
    df = spark.createDataFrame(
        [(999,), (1500,), (2_500_000,), (3_200_000_000,), (None,)], "size long"
    )
    got = [r["fmt"] for r in df.select(format_size(F.col("size")).alias("fmt")).collect()]
    assert got == ["999 o", "1.5 Ko", "2.5 Mo", "3.2 Go", None]
