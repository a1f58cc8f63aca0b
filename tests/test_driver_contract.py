"""Every queries() entry must match its oracle_sql() on sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.driver_queries import ORACLE, QUERIES

from .oracle_compare import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn(sf_correct):
    c = duckdb_conn(sf_correct)
    yield c
    c.close()


def test_entry_smoke(spark, sf_small):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_vs_oracle(spark, sf_correct, conn, name):
    compare(QUERIES[name](spark, sf_correct), conn, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_query_runs(spark, sf_correct, name):
    # No-oracle queries (non-SQL-expressible) must at least run and
    # return a stable schema.
    df = QUERIES[name](spark, sf_correct)
    assert df.columns
    df.limit(5).collect()
