"""Property-based parity: for ARBITRARY URL-ish strings the Catalyst and
scalar renderings of every URL helper must agree — the invariant the
simulator-oracle equivalence rests on (hypothesis finds the edge cases
hand-written corpora miss)."""

from __future__ import annotations

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fscrawler_spark.functions import urls as U

_seg = st.text(
    alphabet=st.sampled_from("abcz09._-%+[]' ~"), min_size=1, max_size=8
)
_host = st.from_regex(r"[a-z][a-z0-9.-]{0,10}\.[a-z]{2,3}", fullmatch=True)

_url = st.builds(
    lambda scheme, host, segs, slash, frag: scheme
    + host
    + ("/" + "/".join(segs) if segs else "")
    + slash
    + frag,
    st.sampled_from(["http://", "https://", "HTTP://".lower()]),
    _host,
    st.lists(_seg, max_size=4),
    st.sampled_from(["", "/", "//"]),
    st.sampled_from(["", "#frag", "#a#b"]),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_url, min_size=1, max_size=24))
def test_url_helpers_parity(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
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
        assert row["host"] == U.url_host_py(u), ("host", u)
        assert row["path"] == U.url_path_py(u), ("path", u)
        assert row["depth"] == U.url_depth_py(u), ("depth", u)
        assert row["name"] == U.url_name_py(u), ("name", u)
        assert row["ext"] == U.url_extension_py(u), ("ext", u)
        assert row["norm"] == U.url_normalize_py(u), ("norm", u)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_url, st.one_of(_url, _seg, st.just(""),
                                          st.just("mailto:x@y"))),
                min_size=1, max_size=16))
def test_url_resolve_parity(spark, pairs):
    df = spark.createDataFrame(list(pairs), "base string, href string")
    got = df.select(
        "base", "href", U.url_resolve(F.col("base"), F.col("href")).alias("out")
    ).collect()
    for row in got:
        assert row["out"] == U.url_resolve_py(row["base"], row["href"]), (
            row["base"], row["href"],
        )


_param = st.builds(
    lambda k, v: k + ("=" + v if v is not None else ""),
    st.sampled_from(["a", "b", "utm_source", "utm_x", "gclid", "notutm",
                     "sessionid", "x%20y", "K"]),
    st.one_of(st.none(), st.text(alphabet="abc123%&#".replace("&", "").replace("#", ""),
                                 max_size=5)),
)

_qurl = st.builds(
    lambda base, params, frag: base
    + ("?" + "&".join(params) if params else "")
    + frag,
    _url,
    st.lists(_param, max_size=5),
    st.sampled_from(["", "#f", "#a?b"]),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_qurl, min_size=1, max_size=24))
def test_canonicalize_url_parity(spark, urls):
    """Catalyst canonicalize_url == scalar twin on arbitrary
    query/fragment-bearing URL-ish strings, and it is idempotent."""
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url", U.canonicalize_url(F.col("url")).alias("c")
    ).collect()
    for r in rows:
        want = U.canonicalize_url_py(r["url"])
        assert r["c"] == want, (r["url"], r["c"], want)
        assert U.canonicalize_url_py(r["c"]) == r["c"]  # idempotent
