"""Combinatorial pipeline matrix: source x filter x bound x terminal.

The reference's parity corpus is 32 scenario queries + 192 generated
node-pipeline permutations over exactly these axes
(generate-fixtures.ts:572-651, 3*4*4*4). Here every permutation is built
TWICE — through this engine's Python DSL, and through the reference Python
SDK serialized to wire JSON and re-parsed — and both executions must
agree, which pins builder, wire parser, and compiler to each other across
the whole grid.
"""

from __future__ import annotations

import json
import sys

import pytest

REF_SDK = "/root/reference/sdks/python/src"
sys.path.insert(0, REF_SDK)

helixdb = pytest.importorskip("helixdb")

from helix_db_spark import P, dsl, g  # noqa: E402
from helix_db_spark.catalog import GraphCatalog  # noqa: E402
from helix_db_spark.engine import HelixSparkEngine  # noqa: E402


@pytest.fixture(scope="module")
def engine(spark):
    cat = GraphCatalog(spark)
    users = spark.createDataFrame(
        [(1, "Alice", 31, 90.5, "active"),
         (2, "Bob", 27, 72.25, "active"),
         (3, "Carol", 42, 64.0, "inactive")],
        "k long, name string, age long, score double, status string")
    cat.add_nodes("ParityUser", users, key_col="k")
    return HelixSparkEngine(cat)


USER_BASE = 1 << 44  # ordinal("ParityUser") == 1 in this catalog


def _sources():
    from helixdb import NodeRef
    yield ("all", lambda t: t.n("ParityUser"),
           lambda r: r.n_with_label("ParityUser"))
    yield ("ids", lambda t: t.n("ParityUser", ids=[USER_BASE + 1,
                                                   USER_BASE + 3]),
           lambda r: r.n(NodeRef.ids([USER_BASE + 1, USER_BASE + 3])))
    yield ("where", lambda t: t.n_where(
        P.and_(P.eq("$label", "ParityUser"), P.gt("age", 26))),
        lambda r: r.n_where(helixdb.SourcePredicate.and_([
            helixdb.SourcePredicate.eq(
                "$label", helixdb.PropertyValue.string("ParityUser")),
            helixdb.SourcePredicate.gt("age",
                                       helixdb.PropertyValue.i64(26))])))


def _filters():
    from helixdb import Predicate, PropertyValue
    yield ("none", lambda t: t, lambda r: r)
    yield ("eq", lambda t: t.where(P.eq("status", "active")),
           lambda r: r.where_(Predicate.eq(
               "status", PropertyValue.string("active"))))
    yield ("range", lambda t: t.where(P.between("age", 27, 42)),
           lambda r: r.where_(Predicate.between(
               "age", PropertyValue.i64(27), PropertyValue.i64(42))))
    yield ("string", lambda t: t.where(P.contains("name", "o")),
           lambda r: r.where_(Predicate.contains("name", "o")))


def _bounds():
    yield ("none", lambda t: t, lambda r: r)
    yield ("sorted", lambda t: t.order_by("age"),
           lambda r: r.order_by("age", "Asc"))
    yield ("limit", lambda t: t.order_by("age").limit(2),
           lambda r: r.order_by("age", "Asc").limit(2))
    yield ("range", lambda t: t.order_by("age").range(1, 3),
           lambda r: r.order_by("age", "Asc").range(1, 3))


def _terminals():
    yield ("count", lambda t: t.count(), lambda r: r.count())
    yield ("values", lambda t: t.values("name"),
           lambda r: r.values(["name"]))
    yield ("ids", lambda t: t.id_(), lambda r: r.id())
    yield ("group_count", lambda t: t.group_count("status"),
           lambda r: r.group_count("status"))


def _rows(df, ordered):
    data = [tuple(r) for r in df.collect()]
    return data if ordered else sorted(data)


@pytest.mark.parametrize("src", list(_sources()), ids=lambda c: c[0])
@pytest.mark.parametrize("flt", list(_filters()), ids=lambda c: c[0])
@pytest.mark.parametrize("bnd", list(_bounds()), ids=lambda c: c[0])
@pytest.mark.parametrize("term", list(_terminals()), ids=lambda c: c[0])
def test_combo(engine, src, flt, bnd, term):
    _, s_mine, s_ref = src
    _, f_mine, f_ref = flt
    _, b_mine, b_ref = bnd
    tname, t_mine, t_ref = term

    mine = engine.run(t_mine(b_mine(f_mine(s_mine(g())))))

    ref_trav = t_ref(b_ref(f_ref(s_ref(helixdb.g()))))
    req = helixdb.DynamicQueryRequest.read(
        helixdb.read_batch().var_as("r", ref_trav).returning(["r"]))
    batch = __import__(
        "helix_db_spark.plans.wire", fromlist=["parse_request"]
    ).parse_request(json.loads(req.to_json_string()))
    wire = engine._executor.execute(batch)["r"]

    # ordering is only guaranteed when the pipeline ends under an OrderBy
    # and the terminal is row-shaped (dsl.rs:3992-3996)
    ordered = bnd[0] != "none" and tname in ("values", "ids")
    assert _rows(mine, ordered) == _rows(wire, ordered), \
        f"{src[0]}/{flt[0]}/{bnd[0]}/{tname}"
