"""Catalog save/load roundtrip: results, ids, index registry, and write
continuation must survive persistence."""

from __future__ import annotations

import pytest

from helix_db_spark import P, dsl, g
from helix_db_spark.catalog import GraphCatalog, IndexEntry
from helix_db_spark.engine import HelixSparkEngine
from helix_db_spark.sources.store import load_catalog, save_catalog
from helix_db_spark.sources.tpch import load_graph

SF_DIR = "/root/testdata/sf0.001"


def test_roundtrip_query_equivalence(spark, tmp_path):
    cat = load_graph(spark, SF_DIR)
    cat.create_index(IndexEntry("node_vector", "embeddings", "embedding"))
    root = str(tmp_path / "store")
    save_catalog(cat, root, partitions=4)

    cat2 = load_catalog(spark, root)
    assert cat2.indexes == cat.indexes
    q = g().n("customer").out("in_nation").out("in_region") \
        .group_count("r_name")
    want = sorted(tuple(r) for r in HelixSparkEngine(cat).run(q).collect())
    got = sorted(tuple(r) for r in HelixSparkEngine(cat2).run(q).collect())
    assert got == want


def test_roundtrip_preserves_write_ids(spark, tmp_path):
    cat = GraphCatalog(spark)
    cat.add_nodes("user", spark.createDataFrame(
        [(1, "alice")], "k long, name string"), key_col="k")
    eng = HelixSparkEngine(cat)
    eng.execute_batch(dsl.write_batch()
                      .var_as("b", g().add_n("user", name="bob"))
                      .returning("b"))
    root = str(tmp_path / "store")
    save_catalog(cat, root)

    cat2 = load_catalog(spark, root)
    eng2 = HelixSparkEngine(cat2)
    # id allocator resumes past the persisted rows — no collision
    eng2.execute_batch(dsl.write_batch()
                       .var_as("c", g().add_n("user", name="carol"))
                       .returning("c"))
    names = {r["name"] for r in eng2.run(g().n("user").values("name"))
             .collect()}
    assert names == {"alice", "bob", "carol"}
    ids = [r["id"] for r in eng2.run(g().n("user").id_()).collect()]
    assert len(ids) == len(set(ids)), "allocated ids collided after reload"


def test_saved_layout_prunes_scans(spark, tmp_path):
    """The persisted layout must keep pushdown working: a filtered scan on
    the reloaded catalog still shows PushedFilters at the parquet scan."""
    cat = load_graph(spark, SF_DIR)
    root = str(tmp_path / "store")
    save_catalog(cat, root, partitions=2)
    eng = HelixSparkEngine(load_catalog(spark, root))
    df = eng.run(g().n("customer").where(P.gt("c_acctbal", 5000.0))
                 .values("c_custkey"))
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal" \
        in plan


def test_in_hop_uses_dst_clustered_copy(spark, tmp_path):
    """The store writes a second edge copy clustered by _dst; a reloaded
    catalog routes in-hops to it (scan path shows edges_by_dst) and the
    results match the primary-copy answer exactly."""
    cat = load_graph(spark, SF_DIR)
    root = str(tmp_path / "store")
    save_catalog(cat, root, partitions=2)

    cat2 = load_catalog(spark, root)
    assert "in_nation" in cat2._edges_dst
    q = g().n("nation").in_("in_nation").count()
    df = HelixSparkEngine(cat2).run(q)
    # inputFiles, not the plan string — Spark truncates long Locations in
    # toString, which can cut off the directory name under pytest tmp paths
    assert any("edges_by_dst" in f for f in df.inputFiles()), \
        "in-hop must scan the dst-clustered copy"
    want = sorted(tuple(r) for r in HelixSparkEngine(cat).run(q).collect())
    got = sorted(tuple(r) for r in df.collect())
    assert got == want

    # a write to the label drops the derived copy (stale layout)
    cat2.replace_edges("in_nation", cat2.edges("in_nation")["in_nation"])
    assert "in_nation" not in cat2._edges_dst
    # and the hop still answers correctly from the primary
    got2 = sorted(tuple(r)
                  for r in HelixSparkEngine(cat2).run(q).collect())
    assert got2 == want
