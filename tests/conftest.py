import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from helix_db_spark import get_spark

    s = get_spark("helix-db-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def catalog(spark):
    from helix_db_spark.sources.tpch import load_graph

    return load_graph(spark, SF_DIR)


@pytest.fixture(scope="session")
def engine(catalog):
    from helix_db_spark.engine import HelixSparkEngine

    return HelixSparkEngine(catalog)


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the same parquet tables as views."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def assert_same(spark_df, duck_rel, sort=True):
    """Order-insensitive, name-sorted comparison (mirrors the driver gate)."""
    cols = sorted(spark_df.columns)
    s_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]
    d_cols = duck_rel.columns
    assert sorted(c.lower() for c in d_cols) == sorted(c.lower() for c in cols), (
        f"columns differ: spark={sorted(cols)} duck={sorted(d_cols)}")
    idx = {c.lower(): i for i, c in enumerate(d_cols)}
    d_rows = [tuple(_norm(row[idx[c.lower()]]) for c in cols)
              for row in duck_rel.fetchall()]
    if sort:
        s_rows, d_rows = sorted(s_rows, key=repr), sorted(d_rows, key=repr)
    assert s_rows == d_rows, (
        f"rows differ (spark {len(s_rows)} vs duck {len(d_rows)}):\n"
        f"spark[:3]={s_rows[:3]}\nduck[:3]={d_rows[:3]}")
