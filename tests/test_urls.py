"""Column vs scalar parity for every URL helper (functions/urls.py).

The scalar twins drive the simulator oracle, so any drift between the
two renderings silently breaks the e2e contract — this test pins them
together on an adversarial URL corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fscrawler_spark.functions import urls as U

CORPUS = [
    "http://h0.example",
    "http://h0.example/",
    "http://h0.example/a",
    "http://h0.example/a/b/c.html",
    "https://H0.EXAMPLE/A/b//c.HTML#frag",
    "http://h1.example/s1/s4/file.with.dots.tar.gz",
    "http://h2.example/no-ext-here/",
    "http://h3.example/x.averylongextension123",  # >12 chars -> null ext
    "http://h4.example/name.",  # trailing dot, no ext
    "http://h5.example/a+b/c++.html",
    "http://h6.example/s2[alpha_beta].htm",
    "http://h7.example/%20enc/sp%41ce.txt",
]


def test_scalar_column_parity(spark):
    df = spark.createDataFrame([(u,) for u in CORPUS], "url string")
    got = df.select(
        "url",
        U.url_host(F.col("url")).alias("host"),
        U.url_path(F.col("url")).alias("path"),
        U.url_depth(F.col("url")).alias("depth"),
        U.url_name(F.col("url")).alias("name"),
        U.url_extension(F.col("url")).alias("ext"),
        U.url_normalize(F.col("url")).alias("norm"),
    ).collect()
    for row in got:
        u = row["url"]
        assert row["host"] == U.url_host_py(u), u
        assert row["path"] == U.url_path_py(u), u
        assert row["depth"] == U.url_depth_py(u), u
        assert row["name"] == U.url_name_py(u), u
        assert row["ext"] == U.url_extension_py(u), u
        assert row["norm"] == U.url_normalize_py(u), u


def test_resolve_parity(spark):
    cases = [
        ("http://h0.example/a/b/page.html", "http://x.example/abs.html"),
        ("http://h0.example/a/b/page.html", "/rooted/x.html"),
        ("http://h0.example/a/b/page.html", "relative.html"),
        ("http://h0.example/a/b/page.html", "//proto.example/rel"),
        ("http://h0.example/a/b/page.html", "mailto:x@example.com"),
        ("http://h0.example/a/b/page.html", ""),
        ("http://h0.example", "child.html"),
    ]
    df = spark.createDataFrame(cases, "base string, href string")
    got = df.select(
        "base", "href", U.url_resolve(F.col("base"), F.col("href")).alias("out")
    ).collect()
    for row in got:
        assert row["out"] == U.url_resolve_py(row["base"], row["href"]), (
            row["base"],
            row["href"],
        )


def test_extension_semantics():
    # length-cap 12 and no-dot => None (extension_filter.py:46-49 analog)
    assert U.url_extension_py("http://h/x.averylongextension123") is None
    assert U.url_extension_py("http://h/noext") is None
    assert U.url_extension_py("http://h/x.HTML") == "html"
    assert U.url_extension_py("http://h/a.tar.gz") == "gz"


def test_depth_semantics():
    assert U.url_depth_py("http://h0.example") == 0
    assert U.url_depth_py("http://h0.example/") == 0
    assert U.url_depth_py("http://h0.example/a") == 1
    assert U.url_depth_py("http://h0.example/a/b/") == 2


def test_surt_key_canonical_form(spark):
    from fscrawler_spark.functions.urls import surt_key

    rows = [
        (1, "http://www.Example.COM/a/b.html"),
        (2, "https://sub.deep.example.org/"),
        (3, "http://example.com"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["s"] for r in df.select("id", surt_key(F.col("url")).alias("s")).collect()}
    assert got[1] == "com,example,www)/a/b.html"
    assert got[2] == "org,example,deep,sub)/"
    assert got[3] == "com,example)"


def test_zorder_matches_python_morton(spark):
    """Bit-exact vs a pure-Python Morton interleave, including the
    locality property (adjacent (x,y) cells stay within small z
    distance blocks)."""
    from fscrawler_spark.functions.layout import zorder2

    def py_spread(v):
        v &= 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    pts = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 3, 7, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder2("x", "y").alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == py_spread(x) | (py_spread(y) << 1), (x, y)
    assert got[(3, 3)] == 15  # the canonical 2x2 block check


def test_canonicalize_url_matches_scalar_twin(spark):
    from pyspark.sql import functions as F
    from fscrawler_spark.functions.urls import (
        canonicalize_url,
        canonicalize_url_py,
    )

    urls = [
        "http://a.example/p?utm_source=feed&b=2&a=1",
        "HTTP://A.Example/p?a=1&b=2&gclid=xyz#frag",
        "http://a.example/p?b=2&a=1",
        "http://a.example/p",
        "http://a.example/p?UTM_CAMPAIGN=x",
        "http://a.example/p?x=%C3%A9&a",
        "http://a.example/p?sessionid=42&PHPSESSID=9&jsessionid=1&ok=1",
        "http://h.example/?fbclid=abc",
        "http://h.example/deep/path?z=1&y=2&x=3",
        "relative/path?utm_x=1&k=v",
        "http://h.example/p?a=1&a=0",        # dup keys keep both, sorted
        "http://h.example/p#only-frag",
        "http://h.example/p?",               # empty query
        "http://h.example/p?notutm_a=1",     # must NOT strip (prefix anchored)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    want = [canonicalize_url_py(u) for u in urls]
    assert got == want
    # the three alias spellings of the same page collapse
    assert got[0] == got[1] == got[2] == "http://a.example/p?a=1&b=2"
    assert got[4] == "http://a.example/p"
    assert got[6] == "http://a.example/p?ok=1"
    assert got[13] == "http://h.example/p?notutm_a=1"
