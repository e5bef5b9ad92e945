"""Edge vector/text search: VectorSearchEdges/TextSearchEdges with the
$from/$to and $distance contracts (dsl.rs:2849-2883; edge hits expose
endpoint ids, dsl.rs:145-146). Seed shape mirrors FIXTURES.md FOLLOWS
(embedding len-2 + BM25-indexed note)."""

from __future__ import annotations

import pytest

from helix_db_spark import g
from helix_db_spark.catalog import GraphCatalog
from helix_db_spark.engine import HelixSparkEngine


@pytest.fixture(scope="module")
def engine(spark):
    cat = GraphCatalog(spark)
    users = spark.createDataFrame(
        [(1, "Alice"), (2, "Bob"), (3, "Carol")], "k long, name string")
    cat.add_nodes("User", users, key_col="k")
    follows = spark.createDataFrame(
        [(1, 2, 1.0, "Alice follows Bob", [1.0, 0.0]),
         (2, 3, 0.5, "Bob follows Carol", [0.0, 1.0])],
        "sk long, dk long, weight double, note string, "
        "embedding array<float>")
    cat.add_edges("FOLLOWS", follows, src_label="User", dst_label="User",
                  src_key="sk", dst_key="dk")
    return HelixSparkEngine(cat)


def test_vector_search_edges_distance_order(engine):
    df = engine.run(
        g().vector_search("FOLLOWS", "embedding", [1.0, 0.1], 2,
                          target="edges")
        .project(note="note", d="$distance"))
    rows = df.collect()
    assert [r["note"] for r in rows] == ["Alice follows Bob",
                                         "Bob follows Carol"]
    assert rows[0]["d"] < rows[1]["d"]  # ascending = closer


def test_vector_search_edges_endpoint_projection(engine):
    df = engine.run(
        g().vector_search("FOLLOWS", "embedding", [1.0, 0.0], 1,
                          target="edges")
        .project_list([("src_name", "$from.name"),
                       ("dst_name", "$to.name")]))
    assert df.collect()[0].asDict() == {"src_name": "Alice",
                                        "dst_name": "Bob"}


def test_text_search_edges_bm25(engine):
    df = engine.run(
        g().text_search("FOLLOWS", "note", "carol", 5, target="edges")
        .project(note="note", d="$distance"))
    rows = df.collect()
    assert [r["note"] for r in rows] == ["Bob follows Carol"]
    assert rows[0]["d"] < 0  # _distance = -score, matches hit


def test_edge_hit_to_nodes_drops_distance(engine):
    """Traversal off the hit stream drops $distance (dsl.rs:150-154)."""
    df = engine.run(
        g().vector_search("FOLLOWS", "embedding", [1.0, 0.0], 1,
                          target="edges")
        .out_n().values("name"))
    assert [r["name"] for r in df.collect()] == ["Bob"]
