"""Core traversal operators vs the DuckDB oracle."""

from helix_db_spark import P, X, g

from .conftest import assert_same


def test_count(engine, oracle):
    df = engine.run(g().n("customer").count())
    assert_same(df, oracle.sql("SELECT count(*) AS count FROM customer"))


def test_filter_values(engine, oracle):
    df = engine.run(
        g().n("customer").where(P.gt("c_acctbal", 5000.0))
        .values("c_custkey", "c_name", "c_acctbal"))
    assert_same(df, oracle.sql(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_acctbal > 5000.0"))


def test_predicate_algebra(engine, oracle):
    pred = P.and_(P.eq("o_orderstatus", "O"),
                  P.or_(P.gt("o_totalprice", 200000.0),
                        P.starts_with("o_orderpriority", "1")))
    df = engine.run(g().n("orders").where(pred).values("o_orderkey"))
    assert_same(df, oracle.sql(
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' AND "
        "(o_totalprice > 200000.0 OR o_orderpriority LIKE '1%')"))


def test_between_inclusive(engine, oracle):
    df = engine.run(g().n("part").where(P.between("p_size", 10, 20))
                    .values("p_partkey", "p_size"))
    assert_same(df, oracle.sql(
        "SELECT p_partkey, p_size FROM part WHERE p_size BETWEEN 10 AND 20"))


def test_out_hop(engine, oracle):
    df = engine.run(g().n("customer").out("in_nation").group_count("n_name"))
    assert_same(df, oracle.sql(
        "SELECT n_name, count(*) AS count FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"))


def test_two_hop(engine, oracle):
    df = engine.run(
        g().n("customer").out("in_nation").out("in_region")
        .group_count("r_name"))
    assert_same(df, oracle.sql(
        "SELECT r_name, count(*) AS count FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"))


def test_in_hop(engine, oracle):
    df = engine.run(
        g().n("nation").in_("in_nation").values("c_custkey"))
    assert_same(df, oracle.sql(
        "SELECT c_custkey FROM customer JOIN nation "
        "ON c_nationkey = n_nationkey"))


def test_edge_stream_and_endpoints(engine, oracle):
    df = engine.run(
        g().n("orders").where(P.eq("o_orderstatus", "F"))
        .out_e("ordered_part").out_n().dedup().values("p_partkey"))
    assert_same(df, oracle.sql(
        "SELECT DISTINCT l_partkey AS p_partkey FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus='F'"))


def test_other_n(engine, oracle):
    # arrive at edge via outE from orders; other end = part
    df = engine.run(
        g().n("orders").out_e("ordered_part").other_n().dedup()
        .values("p_partkey"))
    assert_same(df, oracle.sql(
        "SELECT DISTINCT l_partkey AS p_partkey FROM lineitem"))


def test_order_limit(engine, oracle):
    df = engine.run(
        g().n("orders").order_by_multiple(("o_totalprice", "Desc"),
                                          ("o_orderkey", "Asc"))
        .limit(10).values("o_orderkey", "o_totalprice"))
    assert_same(df, oracle.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"))


def test_skip_range(engine, oracle):
    df = engine.run(
        g().n("orders").order_by("o_orderkey").range(10, 25)
        .values("o_orderkey"))
    assert_same(df, oracle.sql(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
        "LIMIT 15 OFFSET 10"))


def test_aggregate_by(engine, oracle):
    df = engine.run(g().n("lineitem").aggregate_by("Sum", "l_quantity"))
    assert_same(df, oracle.sql(
        "SELECT sum(l_quantity) AS sum FROM lineitem"))
    df = engine.run(g().n("customer").aggregate_by("Mean", "c_acctbal"))
    assert_same(df, oracle.sql(
        "SELECT avg(c_acctbal) AS mean FROM customer"))


def test_exists(engine):
    assert engine.run(g().n("customer").where(
        P.gt("c_acctbal", 1e12)).exists()).collect()[0]["exists"] is False
    assert engine.run(g().n("customer").exists()).collect()[0]["exists"] is True


def test_expr_project(engine, oracle):
    df = engine.run(
        g().n("lineitem")
        .project(okey="l_orderkey",
                 revenue=X.mul(X.prop("l_extendedprice"),
                               X.sub(X.const(1.0), X.prop("l_discount")))))
    assert_same(df, oracle.sql(
        "SELECT l_orderkey AS okey, "
        "l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem"))


def test_case_expr(engine, oracle):
    df = engine.run(
        g().n("customer").project(
            key="c_custkey",
            tier=X.case([(P.gte("c_acctbal", 5000.0), "high"),
                         (P.gte("c_acctbal", 0.0), "mid")], "neg")))
    assert_same(df, oracle.sql(
        "SELECT c_custkey AS key, CASE WHEN c_acctbal >= 5000.0 THEN 'high' "
        "WHEN c_acctbal >= 0.0 THEN 'mid' ELSE 'neg' END AS tier "
        "FROM customer"))


def test_params(engine, oracle):
    df = engine.run(
        g().n("customer").where(P.gt("c_acctbal", X.param("floor")))
        .values("c_custkey"), params={"floor": 8000.0})
    assert_same(df, oracle.sql(
        "SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0"))


def test_within_without(engine, oracle, catalog):
    from helix_db_spark import read_batch

    batch = (read_batch()
             .var_as("buyers", g().n("orders").out("placed_by").dedup())
             .var_as("inactive",
                     g().n("customer").without("buyers").values("c_custkey"))
             .var_as("active",
                     g().n("customer").within("buyers").count())
             .returning("inactive", "active"))
    out = engine.execute_batch(batch)
    assert_same(out["inactive"], oracle.sql(
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders)"))
    assert_same(out["active"], oracle.sql(
        "SELECT count(*) AS count FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders)"))


def test_dotted_json_path(engine, oracle):
    # events.props is a JSON string column; dotted access digs into it
    df = engine.run(
        g().n("events").where(P.eq("event_type", "click"))
        .project(event_id="event_id", k="props.k"))
    assert_same(df, oracle.sql(
        "SELECT event_id, json_extract_string(props, '$.k') AS k "
        "FROM events WHERE event_type = 'click'"))
