"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gosmonaut_spark.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_t1(spark):
    """The 500-page synthetic fixture as a DataFrame (cached parquet)."""
    from gosmonaut_spark.fixtures.pages import ensure_pages_parquet
    from gosmonaut_spark.sources.pages import read_pages

    path = ensure_pages_parquet("t1")
    return read_pages(spark, path)
