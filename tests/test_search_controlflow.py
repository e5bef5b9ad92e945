"""Vector/BM25 search, control flow, and write-path tests."""

import duckdb
import pytest

from helix_db_spark import P, g, read_batch, write_batch

from .conftest import SF_DIR, assert_same


def _query_vec(oracle, vec_id=7):
    return oracle.sql(
        f"SELECT embedding FROM embeddings WHERE vec_id = {vec_id}"
    ).fetchone()[0]


def test_vector_topk_exact(engine, oracle):
    q = _query_vec(oracle)
    df = engine.run(
        g().vector_search("embeddings", "embedding", q, 5)
        .project(vec_id="vec_id", distance="$distance"))
    rows = {r["vec_id"]: r["distance"] for r in df.collect()}
    exp = oracle.sql(
        "SELECT vec_id, 1 - list_cosine_similarity(embedding, "
        f"(SELECT embedding FROM embeddings WHERE vec_id=7)) AS d "
        "FROM embeddings ORDER BY d, vec_id LIMIT 5").fetchall()
    assert set(rows) == {r[0] for r in exp}
    for vid, d in exp:
        assert abs(rows[vid] - d) < 1e-5
    assert 7 in rows and abs(rows[7]) < 1e-6  # self is closest


def test_vector_topk_lsh_recall(engine, oracle):
    q = _query_vec(oracle)
    exact = {r["vec_id"] for r in engine.run(
        g().vector_search("embeddings", "embedding", q, 10)
        .values("vec_id")).collect()}
    approx = {r["vec_id"] for r in engine.run(
        g().vector_search("embeddings", "embedding", q, 10, method="lsh")
        .values("vec_id")).collect()}
    # this synthetic data has weak neighbor similarity (cos ~0.3), where
    # banded LSH recall is probabilistic; the planted exact match (cos=1)
    # must always be found, plus a meaningful share of the true top-10.
    # Deterministic: fixed-seed hyperplanes + fixed data.
    assert 7 in approx
    assert len(exact & approx) >= 4


def test_bm25_topk(engine):
    df = engine.run(
        g().text_search("documents", "text", "spark query filter", 5)
        .project(doc_id="doc_id", score="$distance"))
    rows = df.collect()
    assert len(rows) == 5
    scores = [-r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_distance_dropped_after_hop(engine):
    df = engine.run(
        g().text_search("documents", "text", "spark", 3)
        .out("has_embedding").value_map("vec_id"))
    assert "distance" not in [c.lower() for c in df.columns]


def test_union_subs(engine, oracle):
    df = engine.run(
        g().n("nation").union(
            g().out("in_region"),
            g().in_("in_nation"),
        ).label_())
    assert_same(df, oracle.sql(
        "SELECT 'region' AS label FROM nation JOIN region "
        "ON n_regionkey = r_regionkey "
        "UNION ALL SELECT 'customer' FROM customer"))


def test_choose(engine, oracle):
    df = engine.run(
        g().n("customer").choose(
            P.gte("c_acctbal", 0.0),
            g().project(key="c_custkey"),
            g().project(key="c_custkey"),
        ))
    assert df.count() == oracle.sql("SELECT count(*) FROM customer").fetchone()[0]


def test_optional_passthrough(engine, oracle):
    # customers optionally hop to their orders; customers without orders
    # pass through unchanged => same family (node), so count = orders rows
    # + customers with no orders
    df = engine.run(g().n("customer").optional(g().in_("placed_by")).count())
    exp = oracle.sql(
        "SELECT (SELECT count(*) FROM orders) + (SELECT count(*) FROM "
        "customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) "
        "AS count")
    assert_same(df, exp)


def test_repeat_two_hops(engine, oracle):
    df = engine.run(
        g().n("customer").repeat(g().out(), times=2).group_count("r_name"))
    assert_same(df, oracle.sql(
        "SELECT r_name, count(*) AS count FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"))


def test_repeat_deep_lineage_stays_flat(engine):
    """8 rounds of Repeat must not accumulate lineage: each round
    localCheckpoints its frontier, so the FINAL frontier's plan reads one
    materialized RDD — the plan neither embeds 8 rounds of joins nor grows
    with depth (the property that keeps max_depth=100 runnable)."""
    def final_frontier_plan(times):
        df = engine.run(
            g().n("customer").limit(5)
            .repeat(g().both("in_nation").dedup(), times=times).id_())
        return df._jdf.queryExecution().optimizedPlan().toString()

    p2, p8 = final_frontier_plan(2), final_frontier_plan(8)
    # the final frontier is a checkpointed RDD scan, not a join tree
    assert "LogicalRDD" in p8
    assert "Join" not in p8
    # depth-independent plan: 8 rounds may not produce a larger plan than 2
    assert len(p8) <= len(p2) + 64


def test_repeat_deep_pingpong_counts(engine, oracle):
    """8-round ping-pong walk with in-loop dedup: emitted frontiers have
    the closed form the oracle states (4x nation singleton, 4x that
    nation's customer set)."""
    base = 3 << 44  # customer ordinal (sources/tpch.py TABLES order)
    df = engine.run(
        g().n("customer", ids=[base + 5])
        .repeat(g().both("in_nation").dedup(), times=8, emit="After")
        .group_count("$label"))
    assert_same(df, oracle.sql(
        "WITH cn AS (SELECT c_nationkey AS nk FROM customer "
        "WHERE c_custkey = 5), "
        "cc AS (SELECT count(*) AS n FROM customer JOIN cn "
        "ON c_nationkey = nk) "
        'SELECT \'customer\' AS "$label", CAST(4 * n AS BIGINT) AS count '
        "FROM cc UNION ALL SELECT 'nation', 4"))


def test_coalesce_first_nonempty(engine):
    df = engine.run(
        g().n("customer").coalesce_(
            g().where(P.gt("c_acctbal", 1e15)),  # empty
            g().where(P.gt("c_acctbal", 9000.0)),
        ).count())
    assert df.collect()[0]["count"] > 0


def test_write_batch_add_and_drop(spark):
    from helix_db_spark.catalog import GraphCatalog
    from helix_db_spark.engine import HelixSparkEngine

    cat = GraphCatalog(spark)
    cat.add_nodes("user", spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "k long, name string"), key_col="k")
    eng = HelixSparkEngine(cat)

    out = eng.execute_batch(
        write_batch()
        .var_as("carol", g().add_n("user", name="carol", age=33))
        .var_as("alice", g().n("user").where(P.eq("name", "alice")))
        .var_as("knows", g().select("alice").add_e("knows", to="carol"))
        .var_as("friends", g().n("user").where(P.eq("name", "alice"))
                .out("knows").values("name"))
        .var_as("n_users", g().n("user").count())
        .returning("friends", "n_users"))
    assert [r["name"] for r in out["friends"].collect()] == ["carol"]
    assert out["n_users"].collect()[0]["count"] == 3

    out2 = eng.execute_batch(
        write_batch()
        .var_as("gone", g().n("user").where(P.eq("name", "carol")).drop())
        .var_as("n", g().n("user").count())
        .var_as("e", g().e("knows").count())
        .returning("n", "e"))
    assert out2["n"].collect()[0]["count"] == 2
    assert out2["e"].collect()[0]["count"] == 0  # cascade delete


def test_set_remove_property(spark):
    from helix_db_spark.catalog import GraphCatalog
    from helix_db_spark.engine import HelixSparkEngine

    cat = GraphCatalog(spark)
    cat.add_nodes("item", spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, price double"), key_col="k")
    eng = HelixSparkEngine(cat)
    out = eng.execute_batch(
        write_batch()
        .var_as("upd", g().n("item").where(P.eq("k", 1))
                .set_property("price", 99.0))
        .var_as("all", g().n("item").values("k", "price"))
        .returning("all"))
    got = {r["k"]: r["price"] for r in out["all"].collect()}
    assert got == {1: 99.0, 2: 20.0}


def test_read_batch_rejects_writes(engine):
    with pytest.raises(PermissionError):
        engine.execute_batch(
            read_batch().var_as("x", g().add_n("user", name="eve"))
            .returning("x"))


def test_batch_condition_skips(engine):
    from helix_db_spark import Cond

    out = engine.execute_batch(
        read_batch()
        .var_as("none", g().n("customer").where(P.gt("c_acctbal", 1e15)))
        .var_as("fallback", g().n("customer").count())
        .var_as_if("gated", Cond.var_not_empty("none"),
                   g().n("customer").limit(1))
        .returning("fallback"))
    assert out["fallback"].collect()[0]["count"] > 0
    # 'gated' never ran; returning it would KeyError — as designed


def test_vector_topk_ivf_method(engine, oracle):
    """method='ivf' through the DSL/engine: agrees with the direct
    ivf_topk operator on the same frame (same deterministic centroids),
    returns exactly k rows, and the query's own vector ranks first."""
    from helix_db_spark.catalog import _ID
    from helix_db_spark.operators.similarity import ivf_topk

    q = [float(x) for x in _query_vec(oracle)]
    df = engine.run(
        g().vector_search("embeddings", "embedding", q, 5, method="ivf")
        .project(vec_id="vec_id", distance="$distance"))
    got = [(r["vec_id"], round(r["distance"], 6)) for r in df.collect()]
    assert len(got) == 5
    assert got[0][0] == 7 and abs(got[0][1]) < 1e-6

    base = engine.catalog.nodes("embeddings")["embeddings"] \
        .filter("embedding IS NOT NULL")
    want = [(r["vec_id"], round(r["_distance"], 6)) for r in
            ivf_topk(base, _ID, "embedding", q, 5)
            .select("vec_id", "_distance").collect()]
    assert got == want
