"""Filter-chain unit tests (SURVEY §2.2 / FIXTURES.md §3).

Each case pins a reference edge behavior (file:line into /root/reference)
and asserts the scalar ``authorize`` AND the Catalyst ``Column``
rendering agree with the expected verdict.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from fscrawler_spark import schemas
from fscrawler_spark.filters import (
    AndFilter,
    DateFilter,
    DepthFilter,
    ExtensionFilter,
    FilePatternFilter,
    NameFilter,
    NotFilter,
    OrFilter,
    PatternFilter,
    RegexPatternFilter,
    SizeFilter,
    build_filters,
)

TS = datetime(2024, 6, 1, tzinfo=timezone.utc)

# (filter, row, expected_authorize, reference_cite)
CASES = [
    # F1 size: inclusive bounds (size_filter.py:33); missing size denies (:46-49)
    (SizeFilter(10, 100), {"url": "http://h/x", "size": 10}, True, "size min inclusive"),
    (SizeFilter(10, 100), {"url": "http://h/x", "size": 100}, True, "size max inclusive"),
    (SizeFilter(10, 100), {"url": "http://h/x", "size": 9}, False, "below min"),
    (SizeFilter(10, 100), {"url": "http://h/x", "size": 101}, False, "above max"),
    (SizeFilter(10, 100), {"url": "http://h/x", "size": None}, False, "no stat => deny"),
    # F2 depth: <=0 disables (depth_filter.py:30); at-max allows
    (DepthFilter(0), {"url": "http://h/a/b/c/d/e"}, True, "max_depth=0 disables"),
    (DepthFilter(2), {"url": "http://h/a/b"}, True, "exactly at max"),
    (DepthFilter(2), {"url": "http://h/a/b/c"}, False, "max+1 denies"),
    (DepthFilter(2), {"url": "http://h/a/b/c", "depth": 1}, True, "explicit depth col wins"),
    # F3 extension: deny-list, allow-list, len-cap-12 null (extension_filter.py:46-49)
    (ExtensionFilter(excluded=frozenset({"tmp"})), {"url": "http://h/x.tmp"}, False, "excluded ext"),
    (ExtensionFilter(excluded=frozenset({"tmp"})), {"url": "http://h/x.html"}, True, "not excluded"),
    (ExtensionFilter(excluded=frozenset({"tmp"})), {"url": "http://h/noext"}, True, "no ext passes deny-list"),
    (ExtensionFilter(authorized=frozenset({"html"})), {"url": "http://h/x.html"}, True, "authorized ext"),
    (ExtensionFilter(authorized=frozenset({"html"})), {"url": "http://h/x.pdf"}, False, "not in allow-list"),
    (ExtensionFilter(authorized=frozenset({"html"})), {"url": "http://h/noext"}, False, "null ext fails allow-list"),
    (ExtensionFilter(excluded=frozenset({"averylongext1"})), {"url": "http://h/x.averylongextension123"}, True, ">12 chars => null ext"),
    (ExtensionFilter(excluded=frozenset({"html"})), {"url": "http://h/x.HTML"}, False, "case-folded"),
    # F4 pattern: substring NOT glob (path_pattern_filter.py:54-62)
    (PatternFilter(excluded_pattern="mid"), {"url": "http://h/a-mid-b/x"}, False, "substring hit mid-path"),
    (PatternFilter(excluded_pattern="m*d"), {"url": "http://h/a-mid-b/x"}, True, "glob chars are literal"),
    (PatternFilter(authorized_pattern="keep"), {"url": "http://h/keep/x"}, True, "required substring"),
    (PatternFilter(authorized_pattern="keep"), {"url": "http://h/drop/x"}, False, "missing required substring"),
    # F5 regex: case-insensitive default (:31-34), literal-minus-backslash fallback (:64)
    (RegexPatternFilter(excluded_pattern=r"S\d+\.TMP"), {"url": "http://h/s12.tmp"}, False, "ci regex match"),
    (RegexPatternFilter(excluded_pattern=r"lit\?eral"), {"url": "http://h/lit?eral/x"}, False, "literal fallback hit"),
    (RegexPatternFilter(excluded_pattern=r"zzz\d"), {"url": "http://h/clean"}, True, "no match passes"),
    (RegexPatternFilter(authorized_pattern=r"/s\d+/"), {"url": "http://h/s4/x"}, True, "authorized regex"),
    (RegexPatternFilter(authorized_pattern=r"/s\d+/"), {"url": "http://h/other/x"}, False, "authorized regex miss"),
    (RegexPatternFilter(excluded_pattern=r"CASE", case_insensitive=False), {"url": "http://h/case"}, True, "cs mode no match"),
    # F6 name: exact final-segment membership (path_name_ignore_filter.py:29-32)
    (NameFilter(frozenset({"x.tmp"})), {"url": "http://h/a/x.tmp"}, False, "name excluded"),
    (NameFilter(frozenset({"x.tmp"})), {"url": "http://h/x.tmp/y"}, True, "only final segment"),
    # F7 file-pattern: non-leaf bypass (file_pattern_filter.py:24-25)
    (FilePatternFilter(excluded_pattern="skip"), {"url": "http://h/skip/dir"}, True, "no-ext url bypasses"),
    (FilePatternFilter(excluded_pattern="skip"), {"url": "http://h/skip/f.html"}, False, "leaf url filtered"),
    # F8 date: missing ts passes (date_filter.py:50-51); bounds (:54-62)
    (DateFilter(min_date=TS), {"url": "http://h/x", "warc_ts": None}, True, "missing ts passes"),
    (DateFilter(min_date=TS), {"url": "http://h/x", "warc_ts": datetime(2024, 1, 1, tzinfo=timezone.utc)}, False, "below min"),
    (DateFilter(max_date=TS), {"url": "http://h/x", "warc_ts": datetime(2024, 12, 1, tzinfo=timezone.utc)}, False, "above max"),
    (DateFilter(min_date=TS, max_date=datetime(2024, 7, 1, tzinfo=timezone.utc)),
     {"url": "http://h/x", "warc_ts": datetime(2024, 6, 15, tzinfo=timezone.utc)}, True, "in range"),
    # F9/combinators
    (OrFilter((SizeFilter(0, 1), DepthFilter(9))), {"url": "http://h/a", "size": 500}, True, "OR any passes"),
    (OrFilter((SizeFilter(0, 1), PatternFilter(authorized_pattern="zz"))), {"url": "http://h/a", "size": 500}, False, "OR all fail"),
    (AndFilter((SizeFilter(0, 1000), DepthFilter(3))), {"url": "http://h/a", "size": 500}, True, "AND all pass"),
    (NotFilter(SizeFilter(0, 1)), {"url": "http://h/a", "size": 500}, True, "invert selects complement"),
    (NotFilter(SizeFilter(0, 1000)), {"url": "http://h/a", "size": 500}, False, "invert drops passing"),
]


@pytest.mark.parametrize("flt,row,expected,label", CASES, ids=[c[3] for c in CASES])
def test_scalar_semantics(flt, row, expected, label):
    assert flt.authorize(row) is expected, label


def test_column_parity(spark):
    """Every case through the Catalyst rendering in one pass."""
    rows = []
    for i, (flt, row, expected, label) in enumerate(CASES):
        rows.append(
            (
                i,
                row["url"],
                row.get("size"),
                row.get("warc_ts"),
                row.get("depth"),
            )
        )
    df = spark.createDataFrame(
        rows, "case_id int, url string, size long, warc_ts timestamp, depth int"
    )
    for i, (flt, row, expected, label) in enumerate(CASES):
        got = (
            df.where(F.col("case_id") == i)
            .where(F.coalesce(flt.column(), F.lit(False)))
            .count()
        )
        assert (got == 1) is expected, f"Column rendering diverges: {label}"


def test_filter_factory_roundtrip():
    specs = build_filters(
        [
            {"name": "SizeFilter", "args": {"min_size": 1, "max_size": 9}},
            {"name": "ExtensionFilter", "args": {"excluded": ["tmp", "log"]}},
            {
                "name": "OrFilter",
                "args": {
                    "filters": [
                        {"name": "DepthFilter", "args": {"max_depth": 2}},
                        {"name": "PatternFilter", "args": {"authorized_pattern": "ok"}},
                    ]
                },
            },
            {"name": "NotFilter", "args": {"name": "NameFilter",
                                           "args": {"excluded_names": ["a"]}}},
        ]
    )
    assert isinstance(specs[0], SizeFilter) and specs[0].max_size == 9
    assert isinstance(specs[1], ExtensionFilter) and "log" in specs[1].excluded
    assert isinstance(specs[2], OrFilter) and len(specs[2].filters) == 2
    assert isinstance(specs[3], NotFilter)
    row = {"url": "http://h/b/ok", "size": 5}
    assert all(s.authorize(row) for s in specs[:3])
    # the NotFilter selects only names in the excluded set
    assert not specs[3].authorize(row)
    assert specs[3].authorize({"url": "http://h/b/a"})


def test_and_short_circuit_prunes_subtree(tiny):
    """Deny on a directory-like URL prevents its children from ever being
    generated (filter-before-expansion == subtree pruning,
    file_system_crawler.py:447-460) — verified at the simulator level."""
    from fscrawler_spark.plans.job import CrawlJob
    from fscrawler_spark.plans.simulator import simulate_crawl

    job_open = CrawlJob(politeness_budget=50, max_waves=4)
    job_pruned = CrawlJob(
        politeness_budget=50,
        max_waves=4,
        skip_filters=(PatternFilter(excluded_pattern="h0.example/s1"),),
    )
    open_run = simulate_crawl(tiny["pages"], tiny["seeds"], job_open, tiny["robots"])
    pruned = simulate_crawl(tiny["pages"], tiny["seeds"], job_pruned, tiny["robots"])
    sub = [u for u in open_run.order if u.startswith("http://h0.example/s1/")]
    assert sub, "fixture must contain the pruned subtree"
    assert not any(u in pruned.order for u in sub)
    assert not any(u.startswith("http://h0.example/s1/") for u in pruned.seen)
