"""Replay the driver contract: every queries() entry vs its oracle_sql().

This mirrors the grading gate (CORRECTNESS_r{N}.json): row count, sorted
column names, and order-insensitive values must match DuckDB.
"""

import pytest

from .conftest import SF_DIR, assert_same


def _contract():
    import __spark_entry__ as e
    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _contract()


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_contract(name, spark, oracle):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        assert_same(df, oracle.sql(ORACLES[name]))
    else:
        # rows-only check (approximate / non-SQL-expressible operators)
        assert df.count() >= 0
