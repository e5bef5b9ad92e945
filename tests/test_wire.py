"""Wire-protocol tests: parse + execute the reference's dynamic-query JSON.

Mirrors the reference test strategy (SURVEY §5): requests are BUILT WITH THE
REFERENCE PYTHON SDK (imported read-only from /root/reference) so the JSON
this engine parses is byte-for-byte what real SDK clients emit — the same
role the 236-fixture parity corpus plays for the reference
(sdks/typescript/scripts/parity/compare-json.ts). Seed graph follows
FIXTURES.md (ParityUser/FOLLOWS, generate-fixtures.ts:67-148).
"""

from __future__ import annotations

import json
import sys

import pytest

REF_SDK = "/root/reference/sdks/python/src"
sys.path.insert(0, REF_SDK)

helixdb = pytest.importorskip("helixdb")

from pyspark.sql import functions as F  # noqa: E402

from helix_db_spark.catalog import GraphCatalog  # noqa: E402
from helix_db_spark.engine import HelixSparkEngine  # noqa: E402
from helix_db_spark.plans.wire import WireError, parse_request  # noqa: E402


def make_engine(spark) -> HelixSparkEngine:
    cat = GraphCatalog(spark)
    users = spark.createDataFrame(
        [(1, "user-alice", "Alice", 31, 90.5, "active", "London",
          [1.0, 0.0, 0.0]),
         (2, "user-bob", "Bob", 27, 72.25, "active", "Paris",
          [0.9, 0.1, 0.0]),
         (3, "user-carol", "Carol", 42, 64.0, "inactive", "Berlin",
          [0.0, 1.0, 0.0])],
        "k long, externalId string, name string, age long, score double, "
        "status string, city string, embedding array<float>")
    cat.add_nodes("ParityUser", users, key_col="k")
    follows = spark.createDataFrame(
        [(1, 2, 1.0, "2024-01-01"), (2, 3, 0.5, "2024-02-01")],
        "sk long, dk long, weight double, since string")
    cat.add_edges("FOLLOWS", follows, src_label="ParityUser",
                  dst_label="ParityUser", src_key="sk", dst_key="dk")
    return HelixSparkEngine(cat)


def run_request(engine, request) -> dict:
    """Serialize with the reference SDK, re-parse from raw JSON, execute."""
    raw = json.loads(request.to_json_string())
    return engine.execute_json(raw)


@pytest.fixture(scope="module")
def engine(spark):
    return make_engine(spark)


def test_init_scaffold_node_count(engine):
    """The canonical first query (helix-cli init.rs:191-207, fixture 002)."""
    from helixdb import DynamicQueryRequest, g, read_batch
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("node_count", g().n_with_label("ParityUser").count())
        .returning(["node_count"]))
    out = run_request(engine, req)
    assert out == {"node_count": [{"count": 3}]}


def test_filter_hop_values(engine):
    from helixdb import DynamicQueryRequest, Predicate, PropertyValue, g, read_batch
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("names",
                g().n_with_label("ParityUser")
                .where(Predicate.gte("age", PropertyValue.i64(31)))
                .out("FOLLOWS").values(["name"]))
        .returning(["names"]))
    out = run_request(engine, req)
    assert out == {"names": [{"name": "Bob"}]}  # alice(31)->bob; carol follows nobody


def test_order_limit_project_expr(engine):
    from helixdb import (DynamicQueryRequest, Expr, Projection, PropertyValue,
                        g, read_batch)
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("top",
                g().n_with_label("ParityUser").order_by("score", "Desc")
                .limit(2)
                .project([
                    Projection.property("name", "who"),
                    Projection.expr("double_age",
                                    Expr.mul(Expr.prop("age"),
                                             Expr.val(PropertyValue.i64(2)))),
                ]))
        .returning(["top"]))
    out = run_request(engine, req)
    assert out == {"top": [{"who": "Alice", "double_age": 62},
                           {"who": "Bob", "double_age": 54}]}


def test_write_batch_addn_adde(spark):
    from helixdb import DynamicQueryRequest, NodeRef, g, write_batch
    engine = make_engine(spark)
    req = DynamicQueryRequest.write(
        write_batch()
        .var_as("dave", g().add_n("ParityUser", {"name": "Dave", "age": 20}))
        .var_as("e", g().n_with_label("ParityUser")
                .where(helixdb.Predicate.eq(
                    "name", helixdb.PropertyValue.string("Carol")))
                .add_e("FOLLOWS", NodeRef.var("dave"), {"weight": 2.0}))
        .var_as("n", g().n_with_label("ParityUser").count())
        .var_as("ne", g().e_with_label("FOLLOWS").count())
        .returning(["n", "ne"]))
    out = run_request(engine, req)
    assert out == {"n": [{"count": 4}], "ne": [{"count": 3}]}


def test_foreach_accumulates(spark):
    """Fixture-014 semantics: 2 elements in => 2 nodes created."""
    from helixdb import DynamicQueryRequest, Expr, g, read_batch, write_batch
    engine = make_engine(spark)
    body = write_batch().var_as(
        "made", g().add_n("ParityEvent", {"kind": Expr.param("kind")}))
    req = DynamicQueryRequest.write(
        write_batch()
        .for_each_param("events", body)
        .var_as("event_count", g().n_with_label("ParityEvent").count())
        .returning(["event_count"]))
    req.insert_parameter_value("events", [{"kind": "a"}, {"kind": "b"}])
    out = run_request(engine, req)
    assert out == {"event_count": [{"count": 2}]}


def test_batch_condition_gates(engine):
    from helixdb import BatchCondition, DynamicQueryRequest, g, read_batch
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("users", g().n_with_label("ParityUser"))
        .var_as_if("gated", BatchCondition.var_min_size("users", 2),
                   g().n_with_label("ParityUser").count())
        .var_as_if("skipped", BatchCondition.var_empty("users"),
                   g().n_with_label("ParityUser").count())
        .returning(["gated"]))
    out = run_request(engine, req)
    assert out == {"gated": [{"count": 3}]}
    with pytest.raises(KeyError):
        run_request(engine, DynamicQueryRequest.read(
            read_batch()
            .var_as("users", g().n_with_label("NoSuchLabel"))
            .var_as_if("skipped", BatchCondition.var_not_empty("users"),
                       g().n_with_label("ParityUser").count())
            .returning(["skipped"])))


def test_vector_search_distance_contract(engine):
    from helixdb import DynamicQueryRequest, Projection, g, read_batch
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("hits",
                g().vector_search_nodes("ParityUser", "embedding",
                                        [1.0, 0.0, 0.0], 2)
                .project([Projection.property("name", "who"),
                          Projection.property("$distance", "d")]))
        .returning(["hits"]))
    out = run_request(engine, req)
    names = [r["who"] for r in out["hits"]]
    assert names == ["Alice", "Bob"]  # ascending $distance = closer first
    assert out["hits"][0]["d"] == pytest.approx(0.0, abs=1e-6)


def test_search_with_param_queries(engine):
    """The *_with SDK variants: query vector/text as Expr.param, resolved
    at execution time from the request parameters."""
    from helixdb import DynamicQueryRequest, Expr, Projection, g, read_batch
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("hits",
                g().vector_search_nodes_with("ParityUser", "embedding",
                                             Expr.param("qv"), 1)
                .project([Projection.property("name", "who")]))
        .returning(["hits"]))
    req.insert_parameter_value("qv", [0.0, 1.0, 0.0])
    out = run_request(engine, req)
    assert out == {"hits": [{"who": "Carol"}]}


def test_reserved_noops_accepted(engine):
    """Fixture 900: reserved steps parse and act as identity."""
    from helixdb import DynamicQueryRequest, PropertyValue, g, read_batch
    req = DynamicQueryRequest.read(
        read_batch()
        .var_as("n", g().n_with_label("ParityUser")
                .fold().unfold().path().simple_path()
                .with_sack(PropertyValue.i64(0))
                .sack_add(PropertyValue.i64(1))
                .sack_get().count())
        .returning(["n"]))
    out = run_request(engine, req)
    assert out == {"n": [{"count": 3}]}


def test_read_batch_rejects_writes(engine):
    raw = {
        "request_type": "read",
        "query": {"queries": [{"Query": {
            "name": "bad",
            "steps": [{"AddN": {"label": "X", "properties": []}}],
            "condition": None}}],
            "returns": ["bad"]},
    }
    with pytest.raises(WireError, match="write step"):
        parse_request(raw)


def test_datetime_param_rfc3339():
    raw = {
        "request_type": "read",
        "query": {"queries": [], "returns": []},
        "parameters": {"since": "2026-04-12T00:00:00Z"},
        "parameter_types": {"since": "DateTime"},
    }
    batch = parse_request(raw)
    assert batch.parameters["since"] == 1775952000000  # 2026-04-12T00:00:00Z


def test_combo_matrix_sample(engine):
    """A slice of the 192 combinatorial fixtures: source x filter x bound x
    terminal (generate-fixtures.ts:572-651)."""
    from helixdb import (DynamicQueryRequest, NodeRef, Predicate,
                        PropertyValue, g, read_batch)
    cases = [
        (g().n(NodeRef.all()).count(), [{"count": 3}]),
        (g().n_with_label("ParityUser")
         .where(Predicate.contains("city", "on")).count(), [{"count": 1}]),
        (g().n_with_label("ParityUser").order_by("age", "Asc").skip(1)
         .limit(1).values(["name"]), [{"name": "Alice"}]),
        (g().n_with_label("ParityUser")
         .where(Predicate.between("age", PropertyValue.i64(27),
                                  PropertyValue.i64(31)))
         .order_by("age", "Asc").values(["name"]),
         [{"name": "Bob"}, {"name": "Alice"}]),
    ]
    for trav, expected in cases:
        req = DynamicQueryRequest.read(
            read_batch().var_as("r", trav).returning(["r"]))
        assert run_request(engine, req) == {"r": expected}


def test_project_bindings_wire(engine):
    """Row-binding projections (fixtures 909/910; absent from the Python
    SDK, so the raw wire JSON is constructed by hand per dsl.rs:5001)."""
    raw = {
        "request_type": "read",
        "query": {"queries": [{"Query": {
            "name": "rows",
            "steps": [
                {"NWhere": {"Eq": ["$label", {"String": "ParityUser"}]}},
                {"Bind": "u"},
                {"Out": "FOLLOWS"},
                {"ProjectBindings": {
                    "projections": [
                        {"kind": "Property",
                         "target": {"Binding": "u"},
                         "source": "name", "alias": "follower"},
                        {"kind": "Property", "target": "Current",
                         "source": "name", "alias": "followee"},
                        {"kind": "Coalesce",
                         "refs": [
                             {"target": {"Binding": "missing"},
                              "source": "$id"},
                             {"target": "Current", "source": "$id"},
                         ], "alias": "ref_id"},
                    ],
                    "distinct": False}},
            ],
            "condition": None}}],
            "returns": ["rows"]},
    }
    batch = parse_request(raw)
    results = engine._executor.execute(batch)
    rows = {(r["follower"], r["followee"])
            for r in results["rows"].collect()}
    assert rows == {("Alice", "Bob"), ("Bob", "Carol")}
    for r in results["rows"].collect():
        assert r["ref_id"] is not None  # coalesce fell through to Current


def test_read_batch_rejects_index_ddl():
    """Index DDL mutates engine state (drops a multitenant index => changes
    tenant-search semantics); the reference marks create_index/drop_index
    write-mode and ReadBatch rejects them."""
    for step in ({"CreateIndex": {"spec": {"NodeVector": {
                     "label": "Doc", "property": "emb"}},
                     "if_not_exists": False}},
                 {"DropIndex": {"spec": {"NodeVector": {
                     "label": "Doc", "property": "emb"}}}}):
        raw = {
            "request_type": "read",
            "query": {"queries": [{"Query": {
                "name": "bad", "steps": [step], "condition": None}}],
                "returns": ["bad"]},
        }
        with pytest.raises(WireError, match="write step"):
            parse_request(raw)


def test_compiler_rejects_index_ddl_in_read_mode(engine):
    """Defense in depth below the wire layer: the compiler itself refuses
    index DDL outside a write batch."""
    from helix_db_spark import dsl as _dsl
    from helix_db_spark.plans import ast as _ast

    spec = _ast.IndexSpec("node_vector", "embeddings", "embedding")
    batch = _ast.Batch("read", (_ast.BatchEntry(
        "x", _ast.Traversal((_ast.CreateIndex(spec, False),))),), ("x",))
    with pytest.raises(PermissionError, match="mutation step"):
        engine.execute_batch(batch)


def test_index_sugar_steps_parse_and_execute(spark):
    """The SDK's create_*_index_* sugar emits flat-payload wire tags
    (dsl.py:1465-1490) that must parse as CreateIndex if-not-exists and
    register the index — including the tenant property."""
    from helixdb import g as rg, write_batch as rwb, DynamicQueryRequest

    req = DynamicQueryRequest.write(
        rwb().var_as("ix", rg().create_vector_index_nodes(
            "Doc", "emb", tenant_property="org"))
        .var_as("tx", rg().create_text_index_nodes("Doc", "body"))
        .returning(["ix"]))
    batch = parse_request(json.loads(req.to_json_string()))
    from helix_db_spark.plans import ast as _ast
    steps = [e.traversal.steps[0] for e in batch.entries]
    assert all(isinstance(s, _ast.CreateIndex) for s in steps)
    assert steps[0].spec.kind == "node_vector"
    assert steps[0].spec.tenant_property == "org"
    assert steps[0].if_not_exists is True
    assert steps[1].spec.kind == "node_text"

    cat = GraphCatalog(spark)
    cat.add_nodes("Doc", spark.createDataFrame(
        [(1, [1.0, 0.0], "hello", "acme")],
        "k long, emb array<float>, body string, org string"), key_col="k")
    eng = HelixSparkEngine(cat)
    eng.execute_batch(batch)
    assert ("node_vector", "Doc", "emb") in cat.indexes
    assert cat.indexes[("node_vector", "Doc", "emb")].tenant_property == "org"
    assert ("node_text", "Doc", "body") in cat.indexes
