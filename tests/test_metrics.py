"""Metrics/analytics pack over crawl results (sql/stats.sql +
MetricsObserver ports, SURVEY §2.4/§2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fscrawler_spark import metrics as M


@pytest.fixture(scope="module")
def results(spark):
    rows = [
        # url, host, depth, wave, size, md5, ext, rating, stage
        ("http://a.x/p1.html", "a.x", 1, 0, 100, "h1", "html", 3, "EXTRACTED"),
        ("http://a.x/p2.html", "a.x", 1, 0, 100, "h1", "html", None, "EXTRACTED"),
        ("http://a.x/d/p3.pdf", "a.x", 2, 1, 300, "h2", "pdf", 5, "EXTRACTED"),
        ("http://b.x/p4.html", "b.x", 1, 0, 50, "h3", "html", 1, "EXTRACTED"),
        ("http://b.x/deep/d/e/p5.txt", "b.x", 4, 2, 70, "h1", "txt", None, "EXTRACTED"),
        ("http://b.x/missing", "b.x", 1, 1, None, None, None, None, "ERROR"),
    ]
    return spark.createDataFrame(
        rows,
        "url string, host string, depth int, wave int, size long, md5_hex string,"
        " extension string, rating int, stage string",
    )


def test_count_by_extension(results):
    got = [(r["extension"], r["cnt"]) for r in M.count_by_extension(results).collect()]
    assert got == [("html", 3), (None, 1), ("pdf", 1), ("txt", 1)]


def test_size_by_extension(results):
    got = {r["extension"]: r["total_bytes"] for r in M.size_by_extension(results).collect()}
    assert got["html"] == 250 and got["pdf"] == 300


def test_duplicate_url_groups(results):
    got = M.duplicate_url_groups(results).collect()
    assert len(got) == 1  # h1 appears at sizes 100,100 and 70 — only (h1,100) dups
    assert got[0]["dup_count"] == 2
    assert got[0]["urls"] == ["http://a.x/p1.html", "http://a.x/p2.html"]


def test_top_deepest(results):
    got = M.top_deepest(results, n=2).collect()
    assert [r["depth"] for r in got] == [4, 2]
    assert got[0]["examples"] == ["http://b.x/deep/d/e/p5.txt"]


def test_top_hosts(results):
    by_bytes = M.top_hosts_by_bytes(results, 1).collect()[0]
    assert by_bytes["host"] == "a.x" and by_bytes["total_bytes"] == 500
    by_pages = M.top_hosts_by_pages(results, 1).collect()[0]
    assert by_pages["host"] == "a.x" and by_pages["pages"] == 3


def test_top_rated_per_host(results):
    got = {(r["host"], r["url"]): r["rating"] for r in M.top_rated_per_host(results, 1).collect()}
    assert got == {("a.x", "http://a.x/d/p3.pdf"): 5, ("b.x", "http://b.x/p4.html"): 1}


def test_extensions_found_not_crawled(spark, results):
    seen = spark.createDataFrame(
        [("http://a.x/p1.html",), ("http://a.x/skipped.tmp",), ("http://c.x/x.pdf",)],
        "url string",
    )
    got = [r["extension"] for r in M.extensions_found_not_crawled(seen, results).collect()]
    assert got == ["tmp"]


def test_crawl_report(spark, results):
    metrics = spark.createDataFrame(
        [(0, "scheduled_n", 4), (1, "scheduled_n", 1), (0, "skipped_n", 2)],
        "wave int, metric string, value long",
    )
    rep = M.crawl_report(results, metrics)
    assert rep["rows"] == 6 and rep["extracted"] == 5 and rep["errors"] == 1
    assert rep["hosts"] == 2 and rep["max_depth"] == 4
    assert rep["scheduled_n"] == 5 and rep["skipped_n"] == 2


def test_longest_urls(results):
    got = M.top_longest_urls(results, 1).collect()[0]
    assert got["url"] == "http://b.x/deep/d/e/p5.txt"


def test_distribution_profile_exact_percentiles(spark):
    """Hand-checkable 5-value group: p50 is the middle value, p90/p99
    interpolate linearly at h=(n-1)q."""
    from fscrawler_spark.metrics import distribution_profile

    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, value double")
    [r] = distribution_profile(df, "g", "value").collect()
    assert r["n"] == 5 and r["min_v"] == 1.0 and r["max_v"] == 10.0
    assert r["p50"] == 3.0

    def ref(q):
        # the engines' exact convention: h=(n-1)q, v[l] + (h-l)(v[l+1]-v[l]),
        # reproduced in the SAME IEEE op order (h-l keeps the rounding)
        h = (len(vals) - 1) * q
        lo = int(h)
        return vals[lo] + (h - lo) * (vals[lo + 1] - vals[lo])

    assert r["p90"] == ref(0.9)
    assert r["p99"] == ref(0.99)


def test_gini_identity_reference(spark):
    """q66's sorted-load Gini identity vs the O(n^2) pairwise
    definition on hand data (uniform -> 0; extreme skew -> high)."""
    import __spark_entry__ as E

    # uniform loads: every user 5 events -> G = 0
    ev = []
    eid = 0
    for u in range(4):
        for _ in range(5):
            ev.append((eid, u, "uni"))
            eid += 1
    # skewed: one user 17 events, three users 1 -> pairwise Gini
    for u, k in [(0, 17), (1, 1), (2, 1), (3, 1)]:
        for _ in range(k):
            ev.append((eid, u, "skew"))
            eid += 1
    df = spark.createDataFrame(ev, "event_id long, user_id long, event_type string")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["event_type"]: r["gini_e6"]
            for r in E.queries()["q66_load_skew_gini"](spark, d).collect()
        }

    def pairwise(xs):
        n = len(xs)
        num = sum(abs(a - b) for a in xs for b in xs)
        return num / (2 * n * n * (sum(xs) / n))

    assert out["uni"] == 0
    want = pairwise([17, 1, 1, 1])
    assert abs(out["skew"] / 1_000_000 - want) < 1e-4


def test_histogram_quantiles_reference(spark):
    """Pure-python type-1 binned quantile parity + the half-bin-width
    accuracy bound against the true (unbinned) quantile."""
    import hashlib
    import math

    from fscrawler_spark.metrics import histogram_quantiles

    lo, hi, n_bins = 0.0, 100.0, 50
    vals = [
        (int(hashlib.md5(f"v{i}".encode()).hexdigest()[:8], 16) % 10_000) / 100.0
        for i in range(800)
    ]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, value double")
    row = histogram_quantiles(df, "g", "value", lo, hi, n_bins).collect()[0]

    width = (hi - lo) / n_bins
    bins = sorted(min(n_bins - 1, max(0, int(math.floor((v - lo) / width)))) for v in vals)
    n = len(bins)
    for num, den, name in ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")):
        want_bin = bins[math.ceil(n * num / den) - 1]  # type-1 on the binned domain
        assert row[f"{name}_bin"] == want_bin
        true_q = sorted(vals)[math.ceil(n * num / den) - 1]
        assert abs(row[f"{name}_mid"] - true_q) <= width / 2 + 1e-9


def test_histogram_quantiles_clamps_and_nulls(spark):
    from fscrawler_spark.metrics import histogram_quantiles

    rows = [("g", -5.0), ("g", 0.0), ("g", 99.99), ("g", 250.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, value double")
    row = histogram_quantiles(df, "g", "value", 0.0, 100.0, 10).collect()[0]
    assert row["n"] == 4  # NULL excluded
    assert row["p99_bin"] == 9  # 250.0 clamped into the top bin


def test_histogram_quantiles_plan_is_jvm_only(spark):
    from fscrawler_spark.metrics import histogram_quantiles

    df = spark.createDataFrame([("g", float(i)) for i in range(50)], "g string, value double")
    plan = (
        histogram_quantiles(df, "g", "value", 0.0, 50.0, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # Exactly two hash exchanges, BOTH post-aggregation-tiny: the
    # (group, bin) count shuffles map-side-combined partials (at most
    # n_bins rows per upstream partition), then the window re-keys
    # those <= n_bins-per-group rows on the group alone.  Shuffling the
    # raw input once on the group instead would move every row AND
    # funnel each group through one task — two tiny beats one huge.
    assert plan.count("Exchange hashpartitioning") == 2
