"""Shared fixtures: one session-scoped SparkSession + tiny deterministic
fixture tables (FIXTURES.md §1-§4)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from fscrawler_spark import schemas
from fscrawler_spark.datagen import generate_pages
from fscrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="fscrawler_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny():
    pages, seeds, robots = generate_pages("tiny", seed=42)
    return {"pages": pages, "seeds": seeds, "robots": robots}


def _rows(records, schema):
    return [tuple(r.get(f.name) for f in schema.fields) for r in records]


@pytest.fixture(scope="session")
def pages_df(spark, tiny):
    return spark.createDataFrame(_rows(tiny["pages"], schemas.PAGES), schemas.PAGES)


@pytest.fixture(scope="session")
def robots_df(spark, tiny):
    return spark.createDataFrame(_rows(tiny["robots"], schemas.ROBOTS), schemas.ROBOTS)
