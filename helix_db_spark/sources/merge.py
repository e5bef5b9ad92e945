"""MERGE upsert over a key-laid-out parquet table with file-level
pruning — the lakehouse write-path primitive (Delta MERGE INTO /
Iceberg copy-on-write at file granularity) the round-7 CoW cost curve
pointed at: rewrite cost proportional to the files an update TOUCHES,
not the table.

Layout contract: :func:`write_keyed_table` writes the table
repartitionByRange + sortWithinPartitions on the key, so every data
file owns a (nearly) disjoint key range and its parquet footer carries
tight min/max key statistics. :func:`merge_upsert` then:

1. reads ONE footer per file (driver-side, bounded by file count — the
   transaction-log analogue; a 100 TB table keeps these stats in a
   manifest instead of re-reading footers),
2. finds the files whose [min, max] key range intersects any update key
   with a broadcast range join (the file-stats side is the broadcast:
   one row per file, never data-sized),
3. rewrites ONLY those files (old rows anti-joined on the update keys,
   update rows unioned in — inserts with keys beyond every range land
   in the rewrite output too), and
4. swaps the rewrite in through the Hadoop FileSystem API, so the
   file ops run against whatever filesystem the table lives on (not
   the driver's local os.* — the ADVICE r7 webdataset class).

Single-writer assumption: the swap is delete-then-rename per file, not
an atomic commit — concurrent writers need the transaction log this
module deliberately stops short of (documented, like the CoW upgrade
path in PLANS.md).
"""

from __future__ import annotations

import os
from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_keyed_table(df: DataFrame, root: str, key_col: str,
                      files: int = 8) -> None:
    """Write ``df`` as a key-range-partitioned parquet table: ``files``
    files, each owning a contiguous key range, rows sorted by key within
    the file so footer min/max stats are tight (the same layout argument
    as sources/layout.zorder_write, in one dimension)."""
    (df.repartitionByRange(files, F.col(key_col))
       .sortWithinPartitions(key_col)
       .write.mode("overwrite").parquet(root))


def file_key_stats(spark: SparkSession, root: str,
                   key_col: str) -> list:
    """[(path, key_min, key_max)] from the parquet footers — one
    metadata read per file, no data scan. Bounded by file count."""
    import pyarrow.parquet as pq
    out = []
    for name in sorted(os.listdir(root)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(root, name)
        md = pq.read_metadata(path)
        idx = md.schema.names.index(key_col)
        kmin = kmax = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                kmin, kmax = None, None
                break
            kmin = st.min if kmin is None else min(kmin, st.min)
            kmax = st.max if kmax is None else max(kmax, st.max)
        out.append((path, kmin, kmax))
    return out


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI.create("file://" + path if "://" not in path
                                  else path)
    return jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf), jvm


def latest_per_key(df: DataFrame, key_col: str,
                   latest_by: str) -> DataFrame:
    """One row per key: the max (latest_by, ...remaining columns) row —
    a deterministic total order, so replaying the same rows always picks
    the same winner. The CDC dedupe step in front of merge_upsert (both
    the streaming sink and the CLI use it)."""
    others = [c for c in df.columns if c not in (key_col, latest_by)]
    packed = df.groupBy(key_col).agg(
        F.max(F.struct(latest_by, *others)).alias("_r"))
    return (packed.select(
        key_col, F.col(f"_r.{latest_by}").alias(latest_by),
        *[F.col(f"_r.{c}").alias(c) for c in others])
        .select(*df.columns))


def merge_upsert(spark: SparkSession, root: str, updates: DataFrame,
                 key_col: str) -> dict:
    """Upsert ``updates`` into the keyed table at ``root``: rows whose
    key exists are replaced, new keys are inserted. Returns
    ``{"files_total", "files_rewritten", "rows_written"}``.

    ``updates`` must be key-unique and key-non-null (raises otherwise —
    MERGE with duplicate source keys is non-deterministic in every
    engine, Delta raises too). The base table is assumed key-unique
    (write_keyed_table of a keyed frame); files with missing footer
    stats are conservatively treated as touched. Merge keys are
    integers (the file-stats frame is typed long); widen the schema
    literal for string keys."""
    dup = (updates.groupBy(key_col).count()
           .filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise ValueError("updates must be key-unique for MERGE")
    if updates.filter(F.col(key_col).isNull()).limit(1).count():
        raise ValueError("updates must have non-null merge keys")

    stats = file_key_stats(spark, root, key_col)
    if not stats:
        raise ValueError(f"no parquet files under {root}")
    if updates.limit(1).count() == 0:
        return {"files_total": len(stats), "files_rewritten": 0,
                "rows_written": 0}
    known = [(p, kmin, kmax) for p, kmin, kmax in stats
             if kmin is not None]
    blind = [p for p, kmin, _ in stats if kmin is None]
    # broadcast range join: file-stats side is one row per FILE —
    # bounded however large the table or the update batch is. The
    # BroadcastNestedLoopJoin this plans to is against that bounded
    # side only (a range condition has no equi key).
    sdf = spark.createDataFrame(
        [(p, kmin, kmax) for p, kmin, kmax in known],
        f"_path string, _kmin long, _kmax long")
    touched_rows = (updates.select(F.col(key_col).alias("_k"))
                    .join(F.broadcast(sdf),
                          F.col("_k").between(F.col("_kmin"),
                                              F.col("_kmax")))
                    .select("_path").distinct().collect())
    touched = sorted({r["_path"] for r in touched_rows} | set(blind))

    cols = spark.read.parquet(root).limit(0).columns
    if set(updates.columns) != set(cols):
        raise ValueError(
            f"updates schema {sorted(updates.columns)} != table schema "
            f"{sorted(cols)}")
    upd = updates.select(*cols)
    if touched:
        old = (spark.read.parquet(*touched)
               .join(upd.select(F.col(key_col)), on=key_col,
                     how="left_anti"))
        out = old.unionByName(upd)
    else:
        out = upd  # pure insert beyond every file range
    tmp = root.rstrip("/") + "_merge_tmp"
    n_files = max(1, len(touched))
    (out.repartitionByRange(n_files, F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite").parquet(tmp))
    rows_written = spark.read.parquet(tmp).count()

    fs, jvm = _hadoop_fs(spark, root)
    HPath = jvm.org.apache.hadoop.fs.Path
    for p in touched:
        fs.delete(HPath(p), False)
    moved = 0
    for name in sorted(os.listdir(tmp)):
        if name.endswith(".parquet"):
            dst = os.path.join(root, f"merge-{moved:05d}-{name}")
            if not fs.rename(HPath(os.path.join(tmp, name)), HPath(dst)):
                raise IOError(f"rename into {dst} failed")
            moved += 1
    fs.delete(HPath(tmp), True)
    return {"files_total": len(stats), "files_rewritten": len(touched),
            "rows_written": rows_written}
