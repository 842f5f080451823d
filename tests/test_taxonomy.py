"""Taxonomy dimension + age gating (reference app/models/taxnomy.py:
10-77: path/depth derivation, nearest-ancestor min_age inheritance,
should_render gating)."""

from __future__ import annotations

import pytest

from fscrawler_spark.plans.taxonomy import age_gate, build_taxonomy

ROWS = [
    {"name": "media", "parent": None},
    {"name": "movies", "parent": "media", "min_age": 12},
    {"name": "horror", "parent": "movies", "min_age": 18},
    {"name": "trailers", "parent": "movies"},  # inherits 12
    {"name": "music", "parent": "media"},  # unrestricted
]


def test_paths_depths_and_inheritance(spark):
    dim = {r["name"]: r for r in build_taxonomy(spark, ROWS).collect()}
    assert dim["media"]["path"] == "media" and dim["media"]["depth"] == 1
    assert dim["horror"]["path"] == "media/movies/horror"
    assert dim["horror"]["depth"] == 3
    # own min_age wins; unset inherits nearest ancestor; root None stays None
    assert dim["horror"]["effective_min_age"] == 18
    assert dim["trailers"]["effective_min_age"] == 12
    assert dim["music"]["effective_min_age"] is None
    assert dim["media"]["effective_min_age"] is None


def test_cycle_and_unknown_parent_rejected(spark):
    with pytest.raises(ValueError, match="cycle"):
        build_taxonomy(
            spark,
            [{"name": "a", "parent": "b"}, {"name": "b", "parent": "a"}],
        )
    with pytest.raises(ValueError, match="unknown"):
        build_taxonomy(spark, [{"name": "a", "parent": "ghost"}])


def test_age_gate(spark):
    tax = build_taxonomy(spark, ROWS)
    df = spark.createDataFrame(
        [
            (1, "horror"),
            (2, "trailers"),
            (3, "music"),
            (4, None),
            (5, "movies"),
        ],
        "doc_id int, category string",
    )
    got = {r["doc_id"] for r in age_gate(df, tax, max_age=12).collect()}
    # 18-rated horror gated out at 12; inherited-12 trailers pass;
    # unrestricted, uncategorized and 12-rated pass
    assert got == {2, 3, 4, 5}
    assert {r["doc_id"] for r in age_gate(df, tax, max_age=18).collect()} == {
        1, 2, 3, 4, 5,
    }
    assert {r["doc_id"] for r in age_gate(df, tax, max_age=7).collect()} == {3, 4}
