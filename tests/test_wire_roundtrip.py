"""Serializer tests: AST -> wire JSON -> AST round-trips, structural
equality against the reference SDK's emission for the same program, and
bundle generation consumed by the stored-route server."""

from __future__ import annotations

import json
import sys

import pytest

REF_SDK = "/root/reference/sdks/python/src"
sys.path.insert(0, REF_SDK)

helixdb = pytest.importorskip("helixdb")

from helix_db_spark import P, X, dsl, g  # noqa: E402
from helix_db_spark.plans import ast  # noqa: E402
from helix_db_spark.plans.wire import parse_request  # noqa: E402
from helix_db_spark.plans.wire_out import (  # noqa: E402
    serialize_query_bundle, serialize_request)


def _canon(v):
    if isinstance(v, list):
        return [_canon(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon(v[k]) for k in sorted(v)}
    return v


def _roundtrip(batch: ast.Batch) -> ast.Batch:
    return parse_request(json.loads(json.dumps(serialize_request(batch))))


PROGRAMS = [
    dsl.read_batch().var_as(
        "r", g().n("customer")
        .where(P.and_(P.gt("c_acctbal", 100.0),
                      P.or_(P.contains("c_name", "x"),
                            P.not_(P.is_null("c_phone")))))
        .out("in_nation").dedup().order_by("n_name", "Desc").limit(5)
        .values("n_name")).returning("r").build(),
    dsl.read_batch().var_as(
        "hits", g().vector_search("embeddings", "embedding",
                                  [1.0, 0.5, 0.25], 5)
        .project(vec_id="vec_id", d="$distance")).returning("hits").build(),
    dsl.read_batch().var_as(
        "t", g().n("orders")
        .project(key="o_orderkey",
                 tier=X.case([(P.gte("o_totalprice", 100.0), "hi")], "lo"),
                 v=X.add(X.mul(X.prop("o_totalprice"), 2), X.param("b")))
        ).returning("t").build(),
    dsl.write_batch()
        .var_as("a", g().add_n("User", name="Alice", score=1.5))
        .var_as("e", g().n("User").add_e("KNOWS", to="a", w=2))
        .var_as_if("n", dsl.Cond.var_min_size("a", 1),
                   g().n("User").count())
        .returning("n").build(),
    dsl.read_batch().var_as(
        "x", g().n("customer")
        .repeat(g().out(), times=2, emit="After")
        .group_count("$label")).returning("x").build(),
    dsl.read_batch().var_as(
        "u", g().n("region").union(
            g().in_("in_region").project(name="n_name"),
            g().project(name="r_name"))).returning("u").build(),
]


@pytest.mark.parametrize("batch", PROGRAMS,
                         ids=[f"p{i}" for i in range(len(PROGRAMS))])
def test_roundtrip_wire_fixed_point(batch):
    """serialize∘parse is the identity on wire JSON (the builder's label
    sugar normalizes to NWhere on first serialization, exactly like the
    reference's n_with_label sugar, dsl.py:1691-1695 — so identity is
    asserted at the wire level, not the AST level)."""
    wire1 = _canon(serialize_request(batch))
    wire2 = _canon(serialize_request(_roundtrip(batch)))
    assert wire1 == wire2
    # and parse is stable from there on
    assert _roundtrip(_roundtrip(batch)) == _roundtrip(batch)


def test_structural_equal_to_reference_sdk():
    """Same program via our DSL and the reference SDK must serialize to
    structurally identical JSON (the reference's own cross-SDK parity
    criterion, compare-json.ts:48-62)."""
    ours = dsl.read_batch().var_as(
        "res", g().n("ParityUser")
        .where(P.gt("age", 21)).out("follows").dedup()
        .order_by("name").limit(5).values("name")) \
        .returning("res").build()
    # our n("label") sugar scans by label string; swap in the explicit
    # NWhere variant for byte-parity with the reference's n_with_label
    # sugar (which compiles to NWhere $label Eq, dsl.py:1691-1695)
    ours = ast.Batch(
        "read",
        (ast.BatchEntry("res", ast.Traversal((
            ast.NWhere(ast.Cmp("Eq", "$label",
                               ast.Constant("ParityUser"))),) +
            ours.entries[0].traversal.steps[1:]),),),
        ("res",))

    ref = helixdb.DynamicQueryRequest.read(
        helixdb.read_batch().var_as(
            "res", helixdb.g().n_with_label("ParityUser")
            .where_(helixdb.Predicate.gt(
                "age", helixdb.PropertyValue.i64(21)))
            .out("follows").dedup().order_by("name", "Asc").limit(5)
            .values(["name"]))
        .returning(["res"]))
    theirs = json.loads(ref.to_json_string())
    mine = serialize_request(ours)
    assert _canon(mine["query"]) == _canon(theirs["query"])
    assert mine["request_type"] == theirs["request_type"]


def test_bundle_roundtrip_through_server(spark):
    from helix_db_spark.catalog import GraphCatalog
    from helix_db_spark.engine import HelixSparkEngine
    from helix_db_spark.server import HelixSparkServer, QueryBundle

    route = dsl.read_batch().var_as(
        "adults", g().n("User").where(P.gte("age", X.param("min_age")))
        .values("name")).returning("adults").build()
    raw = serialize_query_bundle(
        {"adults": route}, {},
        read_parameters={"adults": [{"name": "min_age", "ty": "I64"}]})

    cat = GraphCatalog(spark)
    cat.add_nodes("User", spark.createDataFrame(
        [(1, "alice", 31), (2, "bob", 12)], "k long, name string, age long"),
        key_col="k")
    srv = HelixSparkServer(HelixSparkEngine(cat),
                           QueryBundle.from_json(json.loads(raw)))
    status, out = srv.handle("/v1/query/adults",
                             {"parameters": {"min_age": 18}})
    assert (status, out) == (200, {"adults": [{"name": "alice"}]})


def test_bundle_rejects_mode_mismatch():
    w = dsl.write_batch().var_as("a", g().add_n("X")).returning("a").build()
    with pytest.raises(Exception, match="write batch"):
        serialize_query_bundle({"bad": w}, {})


def test_roundtrip_preserves_label_on_id_refs():
    """ADVICE r1: N(label, ids=[...]) used to drop the label on serialize,
    widening a label-scoped id scan to all labels after a round-trip. The
    serializer now emits N + HasLabel (E + EdgeHasLabel) and the parser
    fuses the pair back, so the round-trip is the identity at the AST level
    for non-All refs."""
    b = dsl.read_batch().var_as(
        "r", g().n("customer", ids=[1, 2, 3]).values("c_name")) \
        .returning("r").build()
    rt = _roundtrip(b)
    step = rt.entries[0].traversal.steps[0]
    assert isinstance(step, ast.N)
    assert step.label == "customer"
    assert step.ref.kind == "ids"
    assert rt == b

    eb = dsl.read_batch().var_as(
        "e", g().e("knows", ids=[9]).count()).returning("e").build()
    ert = _roundtrip(eb)
    estep = ert.entries[0].traversal.steps[0]
    assert isinstance(estep, ast.E)
    assert estep.label == "knows"
    assert ert == eb
