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


def test_merge_actions_decision_table(spark):
    """D3 (copy_path_processor.py:54-72): same-size skip, diff-size
    replace, missing insert, gone soft-delete."""
    from fscrawler_spark.plans.stages import merge_actions

    dest = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30)], "url string, size long"
    )
    inc = spark.createDataFrame(
        [("u1", 10), ("u2", 25), ("u4", 40)], "url string, size long"
    )
    got = {r["url"]: r["action"] for r in merge_actions(dest, inc).collect()}
    assert got == {
        "u1": "skip_same_size",
        "u2": "replace_diff_size",
        "u3": "soft_delete",
        "u4": "insert",
    }


def test_apply_merge_outcomes_and_trash_rename(spark):
    """Executable MERGE: dest rows survive skips untouched, incoming
    wins replaces/inserts, soft-deleted rows land in trash with the
    reference's ' (i)' collision suffix (C14, delete_path_processor.py:
    54-63)."""
    from pyspark.sql import functions as F

    from fscrawler_spark.plans.stages import apply_merge

    dest = spark.createDataFrame(
        [("u1", 10, "old1"), ("u2", 20, "old2"), ("u3", 30, "old3")],
        "url string, size long, payload string",
    )
    inc = spark.createDataFrame(
        [("u1", 10, "new1"), ("u2", 25, "new2"), ("u4", 40, "new4")],
        "url string, size long, payload string",
    )
    new_dest, trash = apply_merge(dest, inc)
    rows = {r["url"]: r["payload"] for r in new_dest.collect()}
    # same-size skip keeps the DEST row; replace/insert take incoming
    assert rows == {"u1": "old1", "u2": "new2", "u4": "new4"}
    t = trash.collect()
    assert {r["url"] for r in t} == {"u3"}
    assert t[0]["trash_key"] == "u3" and t[0]["stage"] == "DELETED"

    # delete the same key again (u3 re-appears then vanishes): the second
    # trash entry must be suffixed ' (1)'
    dest2 = new_dest.unionByName(
        spark.createDataFrame([("u3", 99, "again")], "url string, size long, payload string")
    )
    inc2 = inc  # u3 absent -> soft-delete again
    _, trash2 = apply_merge(dest2, inc2, trash=trash)
    keys = sorted(
        r["trash_key"] for r in trash2.where(F.col("url") == "u3").collect()
    )
    assert keys == ["u3", "u3 (1)"]
