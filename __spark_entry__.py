"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`helix_db_spark.entry_queries`, which holds the full
SURVEY §2 operator inventory — each entry pairs a Spark implementation with
an equivalent DuckDB oracle SQL (or a rows-only check for approximate /
non-SQL-expressible operators).
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helix_db_spark import entry_queries as _eq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _eq.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return _eq.oracle_sql()
