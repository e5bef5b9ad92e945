"""SURVEY §7 watch-list semantics, pinned:

- empty-stream aggregates (Min/Max/Sum/Mean of nothing => NULL; Count => 0;
  Exists => false) — the spec is silent, SQL semantics is the contract;
- I64 full range: values near 2^63 survive write -> filter -> read without
  float rounding (the reference's TS SDK uses BigInt for exactly this);
- DateTime: negative epoch millis are legal (fixture 022 uses -1 ms);
- Mean over an integer column widens to double.
"""

from __future__ import annotations

import pytest

from helix_db_spark import P, dsl, g
from helix_db_spark.catalog import GraphCatalog
from helix_db_spark.engine import HelixSparkEngine


@pytest.fixture()
def small_engine(spark):
    cat = GraphCatalog(spark)
    cat.add_nodes("item", spark.createDataFrame(
        [(1, 10, 2.5), (2, 20, 7.5)], "k long, qty long, price double"),
        key_col="k")
    return HelixSparkEngine(cat)


def test_empty_stream_aggregates(small_engine):
    eng = small_engine
    empty = g().n("item").where(P.gt("qty", 10_000))
    out = eng.execute_batch(
        dsl.read_batch()
        .var_as("mn", empty.aggregate_by("Min", "qty"))
        .var_as("mx", empty.aggregate_by("Max", "qty"))
        .var_as("sm", empty.aggregate_by("Sum", "qty"))
        .var_as("av", empty.aggregate_by("Mean", "qty"))
        .returning("mn", "mx", "sm", "av"))
    assert out["mn"].head()["min"] is None
    assert out["mx"].head()["max"] is None
    assert out["sm"].head()["sum"] is None
    assert out["av"].head()["mean"] is None
    # Count of nothing is 0, Exists of nothing is false — never NULL
    assert eng.run(
        g().n("item").where(P.gt("qty", 10_000)).count()).head()["count"] == 0
    assert eng.run(
        g().n("item").where(P.gt("qty", 10_000)).exists()).head()["exists"] \
        is False


def test_i64_full_range_no_float_rounding(spark):
    """2^63-1 and neighbors must round-trip exactly: a float path would
    collapse 9223372036854775806 and ...807 into the same value."""
    big = (1 << 63) - 1
    cat = GraphCatalog(spark)
    cat.add_nodes("w", spark.createDataFrame(
        [(1, big), (2, big - 1), (3, 0)], "k long, v long"), key_col="k")
    eng = HelixSparkEngine(cat)
    got = {r["v"] for r in eng.run(g().n("w").values("v")).collect()}
    assert got == {big, big - 1, 0}
    hits = eng.run(g().n("w").where(P.eq("v", big)).values("v")).collect()
    assert [r["v"] for r in hits] == [big]  # not big-1 too
    assert dict(eng.run(g().n("w").values("v")).dtypes)["v"] == "bigint"


def test_negative_epoch_millis_datetime_param(small_engine):
    """RFC3339 instants before the epoch parse to negative millis and
    compare correctly (fixture 022 uses -1 ms)."""
    from helix_db_spark.plans.wire import parse_request

    batch = parse_request({
        "request_type": "read",
        "query": {"queries": [], "returns": []},
        "parameters": {"since": "1969-12-31T23:59:59.999Z"},
        "parameter_types": {"since": "DateTime"},
    })
    assert batch.parameters["since"] == -1


def test_mean_over_integer_column_is_double(small_engine):
    df = small_engine.run(g().n("item").aggregate_by("Mean", "qty"))
    assert dict(df.dtypes)["mean"] == "double"
    assert df.head()["mean"] == 15.0
