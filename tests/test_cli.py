"""CLI tests (entry point C): subprocess-free — drive main() in-process so
the module-scoped Spark session is reused."""

from __future__ import annotations

import json

import pytest

from helix_db_spark import cli


def _run(capsys, *argv):
    rc = cli.main(list(argv))
    out = capsys.readouterr()
    return rc, out.out, out.err


REQ = json.dumps({
    "request_type": "read",
    "query": {"queries": [{"Query": {
        "name": "r",
        "steps": [{"NWhere": {"Eq": ["$label", {"String": "region"}]}},
                  "Count"],
        "condition": None}}],
        "returns": ["r"]},
})


def test_query_inline_json(spark, capsys):
    rc, out, _ = _run(capsys, "query", "--json", REQ,
                      "--data", "/root/testdata/sf0.001")
    assert rc == 0
    assert json.loads(out) == {"r": [{"count": 5}]}


def test_query_from_file(spark, capsys, tmp_path):
    f = tmp_path / "req.json"
    f.write_text(REQ)
    rc, out, _ = _run(capsys, "query", "--file", str(f),
                      "--data", "/root/testdata/sf0.001")
    assert rc == 0 and json.loads(out) == {"r": [{"count": 5}]}


def test_query_validates_request_type(spark, capsys):
    rc, _, err = _run(capsys, "query", "--json",
                      '{"request_type": "bogus"}')
    assert rc == 2 and "request_type" in json.loads(err)["error"]


def test_query_against_saved_store(spark, capsys, tmp_path):
    from helix_db_spark.sources.store import save_catalog
    from helix_db_spark.sources.tpch import load_graph
    root = str(tmp_path / "store")
    save_catalog(load_graph(spark, "/root/testdata/sf0.001"), root,
                 partitions=2)
    rc, out, _ = _run(capsys, "query", "--json", REQ, "--store", root)
    assert rc == 0 and json.loads(out) == {"r": [{"count": 5}]}


def test_card_command(spark, capsys):
    """`card` prints the dataset-card JSON: corpus rollup row, per-source
    rows, top bigrams, vocab profile — consistent totals."""
    rc, out, _ = _run(capsys, "card", "--data", "/root/testdata/sf0.001",
                      "--top", "3")
    assert rc == 0
    rep = json.loads(out)
    rows = {r["source"]: r for r in rep["card"]}
    assert None in rows and rows[None]["n_docs"] == 500
    assert sum(r["n_docs"] for s, r in rows.items() if s is not None) == 500
    assert len(rep["top_bigrams"]) == 3
    assert rep["top_bigrams"][0]["occurrences"] >= \
        rep["top_bigrams"][-1]["occurrences"]
    assert rep["vocab"]["total_tokens"] == rows[None]["total_tokens"]


def test_curate_command(spark, capsys, tmp_path):
    out_dir = str(tmp_path / "curated")
    rc, out, _ = _run(capsys, "curate", "--data", "/root/testdata/sf0.001",
                      "--out", out_dir)
    assert rc == 0
    got = json.loads(out)
    assert got["input_docs"] == 500
    assert got["kept_docs"] == sum(s["rows"] for s in got["splits"])
    assert {s["split"] for s in got["splits"]} == {"train", "valid", "test"}
    # the written corpus is split-partitioned and re-readable
    back = spark.read.parquet(out_dir)
    assert back.count() == got["kept_docs"]
    assert "split" in back.columns and "text" in back.columns


@pytest.mark.slow
def test_dedup_command_roundtrip(spark, capsys, tmp_path):
    idx = str(tmp_path / "idx")
    rc, out, _ = _run(capsys, "dedup", "--data", "/root/testdata/sf0.001",
                      "--index", idx, "--build-index")
    assert rc == 0
    assert json.loads(out)["corpus_docs"] == 500

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.limit(1).selectExpr("doc_id + 1000000 AS doc_id", "text")
    bpath = str(tmp_path / "batch.parquet")
    batch.write.parquet(bpath)
    rc, out, _ = _run(capsys, "dedup", "--data", "/root/testdata/sf0.001",
                      "--index", idx, "--batch", bpath)
    assert rc == 0
    rows = [json.loads(ln) for ln in out.strip().splitlines()]
    assert len(rows) == 1 and rows[0]["dup_kind"] == "exact"

    # a non-integer budget typo follows the JSON-error exit-2 contract,
    # not a ValueError traceback (ADVICE r12)
    rc, _, err = _run(capsys, "dedup", "--data", "/root/testdata/sf0.001",
                      "--index", idx, "--batch", bpath,
                      "--max-candidate-pairs", "10k")
    assert rc == 2
    assert "max-candidate-pairs" in json.loads(err.strip())["error"]


def test_warc_command_ingests_archives(spark, capsys, tmp_path):
    """cli warc: archive dir -> extracted parquet corpus with stable
    md5-derived ids."""
    from helix_db_spark.sources.warc import write_warc_fixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(40)
    root = str(tmp_path / "crawl")
    write_warc_fixture(docs, "doc_id", "text", root, partitions=2)
    out_dir = str(tmp_path / "corpus")
    rc, out, _ = _run(capsys, "warc", "--in", root, "--out", out_dir,
                      "--http-ok-only")
    assert rc == 0
    summary = json.loads(out)
    assert summary["records"] == 40
    corpus = spark.read.parquet(out_dir)
    row = corpus.filter(corpus.url == "https://example.com/doc/1").first()
    assert row is not None and row["text"].startswith("doc ")
    assert corpus.select("doc_id").distinct().count() == 40


def test_explain_command(spark, capsys):
    rc, out, _ = _run(capsys, "explain", "--json", REQ,
                      "--data", "/root/testdata/sf0.001")
    assert rc == 0
    assert "== r ==" in out
    assert "FileScan parquet" in out and "region.parquet" in out


@pytest.mark.slow
def test_dedup_append_novel_grows_index(spark, capsys, tmp_path):
    idx = str(tmp_path / "idx")
    rc, _, _ = _run(capsys, "dedup", "--data", "/root/testdata/sf0.001",
                    "--index", idx, "--build-index")
    assert rc == 0
    novel = spark.createDataFrame([(777, "appendable novel words " * 8)],
                                  "doc_id long, text string")
    b1 = str(tmp_path / "b1.parquet")
    novel.write.parquet(b1)
    rc, out, _ = _run(capsys, "dedup", "--data", "/root/testdata/sf0.001",
                      "--index", idx, "--batch", b1, "--append-novel")
    assert rc == 0
    assert json.loads(out.strip().splitlines()[0])["dup_kind"] is None
    # same content again: now a dup of the appended row
    b2 = str(tmp_path / "b2.parquet")
    novel.selectExpr("doc_id + 1 AS doc_id", "text").write.parquet(b2)
    rc, out, _ = _run(capsys, "dedup", "--data", "/root/testdata/sf0.001",
                      "--index", idx, "--batch", b2)
    row = json.loads(out.strip().splitlines()[0])
    assert row["dup_kind"] == "exact" and row["match_id"] == 777


def test_bpe_command_train_then_encode(spark, capsys, tmp_path):
    """cli bpe: --train learns merges from the documents table and
    saves them; --encode tokenizes a parquet with the saved model and
    the reported total equals a driver-side re-encode."""
    model_dir = str(tmp_path / "merges")
    rc, out, _ = _run(capsys, "bpe", "--data", "/root/testdata/sf0.001",
                      "--model", model_dir, "--train", "--merges", "120")
    assert rc == 0
    trained = json.loads(out)
    assert 0 < trained["merges"] <= 120

    enc_out = str(tmp_path / "enc")
    rc, out, _ = _run(capsys, "bpe", "--model", model_dir,
                      "--encode",
                      "/root/testdata/sf0.001/documents.parquet",
                      "--out", enc_out)
    assert rc == 0
    summary = json.loads(out)
    assert summary["docs"] == 500

    from helix_db_spark.operators.tokenizer import BpeModel
    m = BpeModel.load(spark, model_dir)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()
    assert summary["total_tokens"] == \
        sum(len(m.encode_text(r["text"])) for r in docs)


def test_wds_pack_unpack_roundtrip(spark, capsys, tmp_path):
    shards = str(tmp_path / "shards")
    rc, out, _ = _run(capsys, "wds", "--pack",
                      "/root/testdata/sf0.001/documents.parquet",
                      "--out", shards, "--shards", "3",
                      "--members", "txt=text")
    assert rc == 0
    packed = json.loads(out.strip().splitlines()[-1])
    assert packed["shards"] == 3 and packed["samples"] == 500

    back = str(tmp_path / "members")
    rc, out, _ = _run(capsys, "wds", "--unpack", shards, "--out", back)
    assert rc == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["samples"] == 500 and summary["members"] == 500

    df = spark.read.parquet(back)
    # %019d pad: covers the full non-negative int64 range, so the
    # lexicographic==numeric key invariant can never overflow
    docs = {f"{r.doc_id:019d}": r.text for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()}
    got = {r.key: bytes(r.content).decode() for r in df.collect()}
    assert got == docs

    # negative numeric keys would render as "-000...1" and break the
    # ordering invariant silently -> rejected up front (ADVICE r7)
    neg = str(tmp_path / "neg.parquet")
    spark.createDataFrame([(-1, "x"), (2, "y")],
                          "doc_id long, text string") \
        .write.parquet(neg)
    rc, _, err = _run(capsys, "wds", "--pack", neg,
                      "--out", str(tmp_path / "negshards"),
                      "--members", "txt=text")
    assert rc == 2 and "negative" in err

    # flag misuse: neither / both modes -> exit 2, JSON error on stderr
    rc, _, err = _run(capsys, "wds")
    assert rc == 2 and "error" in err
    rc, _, err = _run(capsys, "wds", "--pack", "x", "--unpack", "y")
    assert rc == 2
    rc, _, err = _run(capsys, "wds", "--pack",
                      "/root/testdata/sf0.001/documents.parquet",
                      "--out", str(tmp_path / "s2"),
                      "--members", "txt=nosuchcol")
    assert rc == 2 and "missing columns" in err


def test_cli_layout_zorder_and_compact(spark, capsys, tmp_path):
    events = "/root/testdata/sf0.001/events.parquet"
    zo = str(tmp_path / "zo")
    rc, out, _ = _run(capsys, "layout", "--in", events, "--out", zo,
                      "--zorder", "user_id,value", "--files", "4")
    assert rc == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["op"] == "zorder" and summary["files"] <= 4
    back = spark.read.parquet(zo)
    src = spark.read.parquet(events)
    assert back.count() == summary["rows"] == src.count()
    assert back.exceptAll(src).count() == 0    # content preserved

    # fragment the table into many small files, then compact
    frag = str(tmp_path / "frag")
    src.repartition(24).write.parquet(frag)
    comp = str(tmp_path / "comp")
    rc, out, _ = _run(capsys, "layout", "--in", frag, "--out", comp,
                      "--compact", "--target-mb", "256")
    assert rc == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["in_files"] == 24 and summary["out_files"] == 1
    assert spark.read.parquet(comp).count() == src.count()

    # flag misuse / bad input -> exit 2, JSON error on stderr
    rc, _, err = _run(capsys, "layout", "--in", events,
                      "--out", str(tmp_path / "x"))
    assert rc == 2 and "exactly one" in err
    rc, _, err = _run(capsys, "layout", "--in", events,
                      "--out", str(tmp_path / "x"),
                      "--zorder", "user_id,nosuchcol")
    assert rc == 2 and "missing columns" in err


def test_cli_classify_holdout_and_batch(spark, capsys, tmp_path):
    rc, out, _ = _run(capsys, "classify",
                      "--data", "/root/testdata/sf0.001",
                      "--out", str(tmp_path / "pred"))
    assert rc == 0
    rep = json.loads(out)
    assert rep["rows"] == sum(rep["pred_counts"].values()) > 0
    assert 0.0 <= rep["accuracy"] <= 1.0
    preds = spark.read.parquet(str(tmp_path / "pred"))
    assert preds.count() == rep["rows"]
    assert set(preds.columns) == {"doc_id", "true_lang", "pred_lang",
                                  "log_score"}
    # batch mode: score an unlabeled parquet of new docs
    batch = spark.createDataFrame(
        [(900001, "table join window batch"), (900002, "")],
        "doc_id long, text string")
    batch.write.parquet(str(tmp_path / "batch"))
    rc, out, _ = _run(capsys, "classify",
                      "--data", "/root/testdata/sf0.001",
                      "--batch", str(tmp_path / "batch"))
    assert rc == 0
    rep = json.loads(out)
    assert rep["rows"] == 2 and rep["accuracy"] is None


def test_merge_cli_lifecycle(spark, capsys, tmp_path):
    """init -> merge with --latest-by -> pruned rewrite + content."""
    src = str(tmp_path / "src")
    upd = str(tmp_path / "upd")
    tbl = str(tmp_path / "tbl")
    spark.range(50).selectExpr("id AS k", "id*2 AS v") \
        .write.parquet(src)
    spark.createDataFrame([(3, 999), (3, 998), (49, -1)],
                          "k long, v long").write.parquet(upd)
    rc, out, _ = _run(capsys, "merge", "--table", tbl, "--key", "k",
                      "--init", src, "--files", "4")
    assert rc == 0 and json.loads(out)["rows"] == 50
    # duplicate update keys without --latest-by must refuse
    rc, _, err = _run(capsys, "merge", "--table", tbl, "--key", "k",
                      "--updates", upd)
    assert rc == 2 and "key-unique" in err
    rc, out, _ = _run(capsys, "merge", "--table", tbl, "--key", "k",
                      "--updates", upd, "--latest-by", "v")
    assert rc == 0
    st = json.loads(out)
    assert st["files_total"] == 4 and st["files_rewritten"] <= 2
    assert st["version"] == 1
    from helix_db_spark.sources.merge import read_table
    got = read_table(spark, tbl).collect()
    rows = {r["k"]: r["v"] for r in got}
    assert rows[3] == 999 and rows[49] == -1 and len(got) == 50
    # vacuum retires the superseded v0 files
    rc, out, _ = _run(capsys, "merge", "--table", tbl, "--key", "k",
                      "--vacuum-keep", "1")
    assert rc == 0 and json.loads(out)["deleted_versions"] == 1


def test_merge_cli_conflict_is_json_not_traceback(spark, capsys, tmp_path,
                                                  monkeypatch):
    """A commit race (ConcurrentWriteError, a RuntimeError subclass —
    NOT an OSError) must still produce the command's JSON error contract
    and exit code 2, e.g. a CLI merge racing a streaming sink."""
    from helix_db_spark.sources import merge as merge_mod
    src = str(tmp_path / "src")
    upd = str(tmp_path / "upd")
    tbl = str(tmp_path / "tbl")
    spark.range(10).selectExpr("id AS k", "id*2 AS v").write.parquet(src)
    spark.createDataFrame([(3, 999)], "k long, v long").write.parquet(upd)
    rc, _, _ = _run(capsys, "merge", "--table", tbl, "--key", "k",
                    "--init", src, "--files", "2")
    assert rc == 0

    def lose_race(*a, **kw):
        raise merge_mod.ConcurrentWriteError("version 1 was committed "
                                             "by another writer")
    monkeypatch.setattr(merge_mod, "merge_upsert", lose_race)
    rc, _, err = _run(capsys, "merge", "--table", tbl, "--key", "k",
                      "--updates", upd)
    assert rc == 2
    assert "another writer" in json.loads(err.strip())["error"]


@pytest.mark.slow
def test_cli_ivf_lifecycle(spark, capsys, tmp_path, caplog):
    """ivf subcommand round-trip (VERDICT r9 #8): build -> skew-report ->
    drifted append (logs the recluster warning) -> recluster (acts above
    the trigger, reported no-op below)."""
    import logging

    import numpy as np

    rng = np.random.RandomState(11)
    # 3 well-separated clusters, 200 vectors each
    rows = []
    for ci, center in enumerate((-4.0, 0.0, 4.0)):
        for i in range(200):
            rows.append((ci * 200 + i,
                         (rng.standard_normal(8) * 0.1 + center).tolist()))
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.parquet(src)
    idx = str(tmp_path / "ivf")
    rc, out, _ = _run(capsys, "ivf", "--index", idx, "--build", src,
                      "--max-cells", "3")
    assert rc == 0
    st = json.loads(out)
    assert st["op"] == "build" and st["n_rows"] == 600
    rc, out, _ = _run(capsys, "ivf", "--index", idx, "--skew-report")
    assert rc == 0
    healthy = json.loads(out)
    assert healthy["skew_ratio"] < 2.0

    # drifted ingest: everything piles into the cluster-2 cell
    drift = str(tmp_path / "drift")
    drows = [(10000 + i, (rng.standard_normal(8) * 0.1 + 4.0).tolist())
             for i in range(2000)]
    spark.createDataFrame(drows, "vec_id long, embedding array<double>") \
        .write.parquet(drift)
    with caplog.at_level(logging.WARNING,
                         logger="helix_db_spark.operators.similarity"):
        rc, out, _ = _run(capsys, "ivf", "--index", idx,
                          "--append", drift)
    assert rc == 0
    st = json.loads(out)
    assert st["op"] == "append" and st["n_rows"] == 2600
    assert st["skew_ratio"] > 4.0
    assert any("recluster_ivf_index" in r.message for r in caplog.records)

    # recluster acts (skew above the trigger), then a second call no-ops
    rc, out, _ = _run(capsys, "ivf", "--index", idx, "--recluster")
    assert rc == 0
    st = json.loads(out)
    assert st["reclustered"] is True
    assert st["after"]["skew_ratio"] < st["before"]["skew_ratio"]
    rc, out, _ = _run(capsys, "ivf", "--index", idx, "--recluster")
    assert rc == 0 and json.loads(out)["reclustered"] is False

    # mode exclusivity error contract
    rc, _, err = _run(capsys, "ivf", "--index", idx)
    assert rc == 2 and "exactly one" in err


def test_cli_knn_build(spark, capsys, tmp_path):
    """knn subcommand (r12 — the engine-surface wiring for NN-Descent,
    VERDICT r11 #2): builds a (src, dst, rank, cosine) parquet via both
    the celled and NN-Descent strategies, identical output contract."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, (rng.standard_normal(8) + (i % 3) * 4.0).tolist())
            for i in range(120)]
    src = str(tmp_path / "vecs")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.parquet(src)

    # nndescent searches the whole corpus -> exactly k per src; celled
    # searches within IVF cells, so a sparse cell legitimately yields
    # fewer than k neighbors for its members (the IVF recall contract)
    for method, exact_k in (("celled", False), ("nndescent", True)):
        out_dir = str(tmp_path / f"graph_{method}")
        rc, out, _ = _run(capsys, "knn", "--input", src, "--output",
                          out_dir, "--k", "3", "--method", method)
        assert rc == 0
        st = json.loads(out)
        assert st["op"] == "knn"
        assert st["edges"] == 120 * 3 if exact_k \
            else 0 < st["edges"] <= 120 * 3
        g = spark.read.parquet(out_dir)
        assert set(g.columns) == {"src", "dst", "rank", "cosine"}
        assert g.filter("src = dst").count() == 0
        assert g.filter("rank > 3").count() == 0

    # --method auto reports the CONCRETE build it resolved to, never
    # the literal 'auto' (ADVICE r12): 120 rows with no celled knob
    # resolves to the exact baseline
    out_dir = str(tmp_path / "graph_auto")
    rc, out, _ = _run(capsys, "knn", "--input", src, "--output",
                      out_dir, "--k", "3", "--method", "auto")
    assert rc == 0
    assert json.loads(out)["method"] == "exact"

    # missing column -> JSON error, exit 2
    rc, _, err = _run(capsys, "knn", "--input", src, "--output",
                      str(tmp_path / "nope"), "--vec-col", "missing")
    assert rc == 2 and "missing" in err
