"""Extraction parity — the byte-identical per-URL invariant
(BASELINE.json input_hint; SURVEY §5.2).

The vectorized pandas UDFs and the scalar oracle share one code path
(_TEXT_STEPS regex table / keywords_py / rating_py), so equality should
hold bit-for-bit; these tests prove the Arrow round-trip preserves it.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fscrawler_spark.functions.extract import (
    content_rating,
    extract_hrefs_py,
    extract_hrefs_udf,
    extract_text_py,
    extract_text_udf,
    keywords_py,
    keywords_udf,
    md5_hex_py,
    rating_py,
)
from fscrawler_spark.functions.urls import url_name, url_name_py


def test_text_and_links_byte_identical(spark, pages_df, tiny):
    got = (
        pages_df.select(
            "url",
            extract_text_udf(F.col("html")).alias("t"),
            extract_hrefs_udf(F.col("html")).alias("h"),
            F.md5("html").alias("m"),
        )
        .collect()
    )
    by_url = {p["url"]: p for p in tiny["pages"]}
    assert len(got) == len(by_url)
    for row in got:
        page = by_url[row["url"]]
        assert row["t"] == extract_text_py(page["html"]), row["url"]
        assert row["t"] == page["text"], row["url"]  # fixture ground truth
        assert row["h"] == extract_hrefs_py(page["html"]), row["url"]
        assert row["m"] == md5_hex_py(page["html"]), row["url"]


def test_text_pipeline_semantics():
    html = (
        b"<html><head><title>T</title><style>p{}</style></head><body>"
        b'<script>var x = "<p>hidden</p>";</script>'
        b"<p>Hello &amp; <b>world</b> &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;!</p>"
        b"<!-- comment -->  multi   space\n\nlines</body></html>"
    )
    assert (
        extract_text_py(html)
        == "T Hello & world <tag> \"q\" 'a' ! multi space lines"
    )


def test_text_size_cap():
    # 10 MB cap: text_extractor_file_processor.py:27,37
    big = b"<p>" + b"x" * (10 * 1024 * 1024) + b"</p>"
    assert extract_text_py(big) is None
    assert extract_text_py(b"<p>ok</p>") == "ok"


def test_md5_matches_rfc1321():
    data = b"<html>abc</html>"
    assert md5_hex_py(data) == hashlib.md5(data).hexdigest()


def test_keywords_reference_semantics():
    # keywords_file_processor.py:39-56 + split_words :75-81
    assert keywords_py("show - alpha, beta") == ["alpha", "beta"]
    assert keywords_py("s5[tag_red].html") == ["tag", "red", "html"]
    # '- ' branch scans from the END of the '-' split
    assert keywords_py("a.b - x, y - p, q") == ["p", "q"]
    # bad chars reject the part (regex [^a-zA-Z0-9,\s\]]+)
    assert keywords_py("x - bad$, part") is None
    # the '[' branch runs even without '[' (split yields the whole name),
    # so a dotted plain name still produces keywords — reference behavior
    # at keywords_file_processor.py:46-51
    assert keywords_py("plainname.html") == ["plainname", "html"]
    # no dot/underscore at all -> no ', ' after substitution -> None
    assert keywords_py("plainname") is None
    assert keywords_py("") is None


def test_rating_reference_semantics():
    # rating_file_processor.py:34-39 — first '+' run, capped at 5
    assert rating_py("movie+++.mp4") == 3
    assert rating_py("movie++++++++.mp4") == 5
    assert rating_py("plain.mp4") is None
    # name first, then full path fallback
    assert rating_py("plain.mp4", "http://h/dir++/plain.mp4") == 2
    assert rating_py("a+b++", None) == 1  # first run wins, not longest


def test_keywords_rating_udf_parity(spark, pages_df, tiny):
    got = pages_df.select(
        "url",
        keywords_udf(url_name(F.col("url"))).alias("kw"),
        content_rating(url_name(F.col("url")), F.col("url")).alias("rt"),
    ).collect()
    for row in got:
        name = url_name_py(row["url"])
        assert row["kw"] == keywords_py(name), row["url"]
        assert row["rt"] == rating_py(name, row["url"]), row["url"]


def test_sniff_mime_magic_bytes(spark):
    """C7 content sniffing (reference: libmagic on bytes,
    extended_attributes_file_processor.py:28-45) — hand-built byte
    fixtures per signature, scalar and UDF paths identical."""
    from fscrawler_spark.functions.extract import (
        SNIFF_HEAD_BYTES,
        sniff_mime_py,
        sniff_mime_udf,
    )
    from pyspark.sql import functions as F

    cases = [
        (b"%PDF-1.7 blah", "application/pdf"),
        (b"\x89PNG\r\n\x1a\n....", "image/png"),
        (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (b"GIF89a....", "image/gif"),
        (b"PK\x03\x04zipdata", "application/zip"),
        (b"\x1f\x8b\x08gz", "application/gzip"),
        (b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav"),
        (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
        (b"  \n<!DOCTYPE html><html>", "text/html"),
        (b"\xef\xbb\xbf<html lang='en'>", "text/html"),
        (b"<?xml version='1.0'?>", "application/xml"),
        (b"plain words, nothing else 123", "text/plain"),
        (b"\x00\x01\x02binary\x00junk", "application/octet-stream"),
        (b"", None),
        (None, None),
    ]
    for head, want in cases:
        got = sniff_mime_py(head if head is None else head[:SNIFF_HEAD_BYTES])
        assert got == want, (head, got, want)
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, head binary"
    )
    rows = {
        r["i"]: r["m"]
        for r in df.select("i", sniff_mime_udf(F.col("head")).alias("m")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert rows[i] == want, (i, rows[i], want)


def test_fixture_has_live_targets(tiny):
    """The generator must exercise keywords/rating/junk-ext paths."""
    kws = [keywords_py(url_name_py(p["url"])) for p in tiny["pages"]]
    rts = [rating_py(url_name_py(p["url"]), p["url"]) for p in tiny["pages"]]
    assert any(k for k in kws), "no keyword targets in fixture"
    assert any(r for r in rts), "no rating targets in fixture"
