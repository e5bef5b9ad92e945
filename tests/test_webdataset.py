"""WebDataset tar-shard source tests: round-trip, naming rule, sample
view, robustness."""

import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_split_member_name():
    from helix_db_spark.sources.webdataset import split_member_name
    assert split_member_name("000123.txt") == ("000123", "txt")
    assert split_member_name("dir/000123.seg.png") == \
        ("dir/000123", "seg.png")          # multi-dot: first dot splits
    assert split_member_name("a/b/k") == ("a/b/k", "")


def test_webdataset_roundtrip(spark, tmp_path):
    from helix_db_spark.sources.webdataset import (read_webdataset,
                                                   samples_view,
                                                   write_webdataset)
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)], "doc_id long, t string")
    data = docs.select(F.format_string("%06d", "doc_id").alias("k"), "t",
                       F.encode(F.concat(F.lit("payload-"),
                                         F.col("doc_id")), "utf-8")
                       .alias("bin"))
    out = str(tmp_path / "shards")
    write_webdataset(data.repartition(4), out, "k",
                     {"txt": "t", "bin": "bin"})
    shards = sorted(os.listdir(out))
    assert 0 < len(shards) <= 4 and all(s.endswith(".tar") for s in shards)

    rows = read_webdataset(spark, out + "/*.tar")
    got = rows.collect()
    assert len(got) == 40                  # 2 members x 20 samples
    by = {(r.key, r.ext): r for r in got}
    for i in (0, 7, 19):
        k = f"{i:06d}"
        assert bytes(by[(k, "txt")].content).decode() == f"text number {i}"
        assert bytes(by[(k, "bin")].content) == f"payload-{i}".encode()
        assert by[(k, "txt")].size == len(f"text number {i}")

    sv = {r.key: r for r in samples_view(rows).collect()}
    assert all(r.n_members == 2 and r.exts == ["bin", "txt"]
               for r in sv.values())

    # null member columns are skipped, not written as empty files
    data2 = spark.createDataFrame([("a", "x", None)],
                                  "k string, t string, bin binary")
    out2 = str(tmp_path / "s2")
    write_webdataset(data2, out2, "k", {"txt": "t", "bin": "bin"})
    r2 = read_webdataset(spark, out2 + "/*.tar").collect()
    assert [(r.key, r.ext) for r in r2] == [("a", "txt")]


def test_webdataset_skips_non_files_and_raises_on_garbage(spark, tmp_path):
    from helix_db_spark.sources.webdataset import read_webdataset
    p = tmp_path / "mixed.tar"
    with tarfile.open(p, "w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo("dir/s.txt")
        body = b"hello"
        info.size = len(body)
        tf.addfile(info, io.BytesIO(body))
    rows = read_webdataset(spark, str(p)).collect()
    assert [(r.key, r.ext, bytes(r.content)) for r in rows] == \
        [("dir/s", "txt", b"hello")]

    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar archive at all" * 20)
    with pytest.raises(Exception):         # loud, not silent data loss
        read_webdataset(spark, str(bad)).collect()


def test_webdataset_entry_contract(spark):
    """The graded entry end-to-end at the small SF (build + read-back)."""
    from helix_db_spark.entry_queries import REGISTRY
    fn, oracle = REGISTRY["webdataset_roundtrip"]
    out = {r.doc_id: r for r in fn(spark, SF_DIR).collect()}
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    assert set(out) == set(docs)
    for did, text in list(docs.items())[:5]:
        assert out[did].n_members == 2
        assert out[did].txt_bytes == len(text.encode("utf-8"))
        assert out[did].n_px == 256


def test_webdataset_truncation_and_overwrite(spark, tmp_path):
    """Block-aligned truncation (the multipart-upload failure mode) must
    raise — tarfile alone reads it as clean EOF; re-packing to the same
    dir must not leave stale shards; the returned shard count reflects
    files actually on disk (empty partitions write nothing)."""
    from helix_db_spark.sources.webdataset import (read_webdataset,
                                                   write_webdataset)
    data = spark.createDataFrame(
        [(f"{i:04d}", "x" * 600) for i in range(6)], "k string, t string")
    out = str(tmp_path / "shards")
    n = write_webdataset(data.repartition(3), out, "k", {"txt": "t"})
    assert n == len([f for f in os.listdir(out) if f.endswith(".tar")])

    # truncate one shard at a 512 boundary INSIDE the archive
    victim = sorted(os.path.join(out, f) for f in os.listdir(out))[0]
    raw = open(victim, "rb").read()
    open(victim, "wb").write(raw[:1536])   # header+data of first member
    with pytest.raises(Exception):
        read_webdataset(spark, out + "/*.tar").collect()

    # re-pack with fewer partitions: stale shard files must disappear
    n2 = write_webdataset(data.repartition(1), out, "k", {"txt": "t"})
    assert n2 == 1
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 1
    assert read_webdataset(spark, out + "/*.tar").count() == 6

    # more partitions than rows: count reports real shards, not planned
    out2 = str(tmp_path / "sparse")
    n3 = write_webdataset(data.repartition(16), out2, "k", {"txt": "t"})
    assert n3 == len([f for f in os.listdir(out2) if f.endswith(".tar")])
    assert n3 <= 16


def test_wds_cli_string_keys_and_member_validation(spark, capsys, tmp_path):
    import json as _json

    from helix_db_spark import cli

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [("https://a/x", "one"), ("https://b/y", "two")],
        "url string, text string").write.parquet(src)
    out = str(tmp_path / "s")
    rc = cli.main(["wds", "--pack", src, "--out", out, "--key", "url",
                   "--members", "txt=text", "--shards", "1"])
    captured = capsys.readouterr()
    assert rc == 0
    from helix_db_spark.sources.webdataset import read_webdataset
    rows = read_webdataset(spark, out + "/*.tar").collect()
    # string keys pass through — NOT cast-to-long (which would collapse
    # every sample onto the literal key "null")
    assert sorted(r.key for r in rows) == ["https://a/x", "https://b/y"]

    rc = cli.main(["wds", "--pack", src, "--out", out,
                   "--members", "txtnotanequals"])
    captured = capsys.readouterr()
    assert rc == 2 and "ext=col" in captured.err
