"""Edge-rule semantics from the reference spec: multitenancy, unique
indexes, index DDL lifecycle, server-time expressions, Bytes rejection,
$distance in value_map."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from helix_db_spark import P, X, dsl, g
from helix_db_spark.catalog import GraphCatalog, IndexEntry
from helix_db_spark.engine import HelixSparkEngine
from helix_db_spark.plans.wire import WireError, parse_request


@pytest.fixture()
def tenant_engine(spark):
    cat = GraphCatalog(spark)
    cat.add_nodes("Doc", spark.createDataFrame(
        [(1, "t-a", [1.0, 0.0], "alpha beta"),
         (2, "t-a", [0.0, 1.0], "beta gamma"),
         (3, "t-b", [1.0, 0.1], "alpha gamma")],
        "k long, tenant string, emb array<float>, body string"),
        key_col="k")
    cat.create_index(IndexEntry("node_vector", "Doc", "emb",
                                tenant_property="tenant"))
    cat.create_index(IndexEntry("node_text", "Doc", "body",
                                tenant_property="tenant"))
    return HelixSparkEngine(cat)


def test_tenant_missing_is_error(tenant_engine):
    """Missing tenant on a multitenant index => query error
    (dsl.rs:326-330)."""
    with pytest.raises(Exception, match="multitenant"):
        tenant_engine.run(
            g().vector_search("Doc", "emb", [1.0, 0.0], 2).values("k"))


def test_tenant_partitions_results(tenant_engine):
    df = tenant_engine.run(
        g().vector_search("Doc", "emb", [1.0, 0.0], 5, tenant_value="t-a")
        .values("k"))
    assert {r["k"] for r in df.collect()} == {1, 2}  # never t-b's doc 3


def test_unknown_tenant_is_empty(tenant_engine):
    df = tenant_engine.run(
        g().vector_search("Doc", "emb", [1.0, 0.0], 5,
                          tenant_value="t-zzz").values("k"))
    assert df.count() == 0


def test_text_search_tenant_rules(tenant_engine):
    df = tenant_engine.run(
        g().text_search("Doc", "body", "alpha", 5, tenant_value="t-b")
        .values("k"))
    assert [r["k"] for r in df.collect()] == [3]
    with pytest.raises(Exception, match="multitenant"):
        tenant_engine.run(g().text_search("Doc", "body", "alpha", 5)
                          .values("k"))


def test_unique_index_enforced_on_addn(spark):
    cat = GraphCatalog(spark)
    cat.add_nodes("User", spark.createDataFrame(
        [(1, "alice@x")], "k long, email string"), key_col="k")
    cat.create_index(IndexEntry("node_equality", "User", "email",
                                unique=True))
    eng = HelixSparkEngine(cat)
    with pytest.raises(ValueError, match="unique index violation"):
        eng.execute_batch(
            dsl.write_batch()
            .var_as("dup", g().add_n("User", email="alice@x"))
            .returning("dup"))
    out = eng.execute_batch(
        dsl.write_batch()
        .var_as("ok", g().add_n("User", email="bob@x"))
        .var_as("n", g().n("User").count())
        .returning("n"))
    assert out["n"].collect()[0]["count"] == 2


def test_drop_index_lifts_tenant_requirement(tenant_engine):
    cat = tenant_engine.catalog
    cat.drop_index(("node_vector", "Doc", "emb"))
    df = tenant_engine.run(  # now a single-tenant index: no tenant needed
        g().vector_search("Doc", "emb", [1.0, 0.0], 1).values("k"))
    assert df.count() == 1


def test_timestamp_and_datetime_now(spark):
    cat = GraphCatalog(spark)
    cat.add_nodes("T", spark.createDataFrame([(1,)], "k long"), key_col="k")
    eng = HelixSparkEngine(cat)
    before = int(time.time() * 1000)
    row = eng.run(g().n("T").project(ms=X.timestamp(), now=X.now())) \
        .collect()[0]
    after = int(time.time() * 1000)
    assert before - 1000 <= row["ms"] <= after + 1000
    assert row["now"] is not None


def test_bytes_param_rejected():
    with pytest.raises(WireError, match="Bytes"):
        parse_request({
            "request_type": "read",
            "query": {"queries": [], "returns": []},
            "parameters": {"blob": [1, 2, 3]},
            "parameter_types": {"blob": "Bytes"},
        })


def test_repeat_until_exits_matching_elements(spark):
    """until(pred): satisfied elements leave the loop into the result;
    the rest keep iterating up to max_depth (dsl.py:1038-1117)."""
    cat = GraphCatalog(spark)
    cat.add_nodes("Node", spark.createDataFrame(
        [(1, "start"), (2, "mid"), (3, "goal"), (4, "goal")],
        "k long, kind string"), key_col="k")
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "sk long, dk long")
    cat.add_edges("next", chain, src_label="Node", dst_label="Node",
                  src_key="sk", dst_key="dk")
    eng = HelixSparkEngine(cat)
    df = eng.run(g().n("Node", ids=[(1 << 44) + 1])
                 .repeat(g().out("next"), until=P.eq("kind", "goal"),
                         max_depth=10)
                 .values("k", "kind"))
    rows = {(r["k"], r["kind"]) for r in df.collect()}
    assert rows == {(3, "goal")}  # walked start->mid->goal, exited there


def _chain_engine(spark):
    cat = GraphCatalog(spark)
    cat.add_nodes("Node", spark.createDataFrame(
        [(1, "start"), (2, "mid"), (3, "goal"), (4, "lonely")],
        "k long, kind string"), key_col="k")
    cat.add_edges("next", spark.createDataFrame(
        [(1, 2), (2, 3)], "sk long, dk long"),
        src_label="Node", dst_label="Node", src_key="sk", dst_key="dk")
    return HelixSparkEngine(cat)


def test_optional_family_change_drops_unmatched(spark):
    """Same family: unmatched inputs pass through. Family change
    (node -> edge): unmatched inputs are dropped (dsl.rs:4049-4057)."""
    eng = _chain_engine(spark)
    same = eng.run(g().n("Node").optional(g().out("next"))
                   .values("kind"))
    # nodes 1,2 -> successors (mid,goal); 3,4 have no out edge -> themselves
    assert sorted(r["kind"] for r in same.collect()) == \
        ["goal", "goal", "lonely", "mid"]
    changed = eng.run(g().n("Node").optional(g().out_e("next")).count())
    assert changed.collect()[0]["count"] == 2  # only the two edges


def test_repeat_emit_if_filters_and_forces_after(spark):
    """emit_if(pred) emits only matching frontier elements and implies
    emit=After (dsl.py:1038-1117)."""
    eng = _chain_engine(spark)
    df = eng.run(g().n("Node", ids=[(1 << 44) + 1])
                 .repeat(g().out("next"), times=2,
                         emit_if=P.eq("kind", "goal"))
                 .values("kind"))
    # frontiers after hops: {mid}, {goal}; emit_if keeps only goal
    assert [r["kind"] for r in df.collect()] == ["goal"]


def test_value_map_carries_distance(tenant_engine):
    df = tenant_engine.run(
        g().vector_search("Doc", "emb", [1.0, 0.0], 2, tenant_value="t-a")
        .value_map("k"))
    rows = df.collect()
    assert "distance" in rows[0].asDict()
    assert rows[0]["distance"] <= rows[1]["distance"]


@pytest.mark.parametrize("method", ["lsh", "ivf"])
def test_tenant_rules_apply_to_approximate_methods(tenant_engine, method):
    """Tenancy must hold on EVERY search method, not just exact: lsh/ivf
    restrict candidates before the top-k rank (a post-filter would leak
    ranking across tenants and return < k), missing tenant still errors,
    unknown tenant is still empty."""
    q = g().vector_search("Doc", "emb", [1.0, 0.0], 5,
                          tenant_value="t-a", method=method).values("k")
    got = {r["k"] for r in tenant_engine.run(q).collect()}
    assert got <= {1, 2} and 1 in got          # never t-b's doc 3
    with pytest.raises(Exception, match="multitenant"):
        tenant_engine.run(
            g().vector_search("Doc", "emb", [1.0, 0.0], 2,
                              method=method).values("k"))
    empty = tenant_engine.run(
        g().vector_search("Doc", "emb", [1.0, 0.0], 5,
                          tenant_value="t-zzz", method=method).values("k"))
    assert empty.count() == 0
