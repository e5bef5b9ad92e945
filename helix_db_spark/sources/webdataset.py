"""WebDataset-shaped tar shard IO.

WebDataset (the public convention of webdataset.github.io, also the
HuggingFace / torchdata shard format) stores a multimodal training
corpus as plain POSIX ``.tar`` shards: each sample is a run of
consecutive members whose names share a key prefix, with the extension
naming the modality (``000123.txt``, ``000123.png``, ``000123.json``).
Sequential tar reads with no index make it the dominant petabyte-scale
training layout — shards are the unit of parallelism.

Spark mapping: shards are file-parallel (``binaryFile``, one task per
shard, the warc.py shape); ``read_webdataset`` explodes to one row per
member ``(shard, key, ext, content, size)`` — the relational shape, so
sample-level views are one ``groupBy(key)`` away and per-modality
pipelines (decode, dedup, feature-extract) filter on ``ext`` and reuse
the multimodal operators unchanged. ``write_webdataset`` emits one tar
per partition — repartition first to pick the shard count; its
directory lifecycle runs through the Hadoop FileSystem API and only
the tar byte writes need ``out_dir`` executor-mounted (see the
function's staging contract).

Parity note: the reference treats ingestion as the SDK's problem (its
engine receives rows over the wire); this source exists for the
LLM-pipeline surface, like sources/warc.py.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Dict, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WDS_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("ext", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("size", T.LongType()),
])


def split_member_name(name: str):
    """``dir/000123.seg.png`` -> (``dir/000123``, ``seg.png``) — the
    WebDataset rule: the key is everything up to the FIRST dot of the
    basename (multi-part extensions carry pipeline stage names)."""
    head, _, base = name.rpartition("/")
    stem, dot, ext = base.partition(".")
    key = f"{head}/{stem}" if head else stem
    return key, (ext if dot else "")


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """One row per tar member under ``path`` (glob ok): (shard, key,
    ext, content, size). Non-file members (dirs, links) are skipped;
    a truncated/garbled shard raises — silent data loss in a training
    corpus is worse than a failed task retry. tarfile treats a cut at a
    512-block boundary as clean end-of-archive, so the end-of-archive
    marker (two zero blocks) is checked explicitly — a failed multipart
    upload truncates at part boundaries, which ARE block-aligned."""
    bf = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # one output frame per shard: member bytes are held once,
            # not accumulated across every shard in the Arrow batch
            for p, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if len(raw) % 512 != 0 or len(raw) < 1024 or \
                        raw[-1024:].strip(b"\0"):
                    raise ValueError(
                        f"truncated tar shard (no end-of-archive "
                        f"marker): {p}")
                rows = []
                with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = split_member_name(m.name)
                        data = tf.extractfile(m).read()
                        rows.append((p, key, ext, data, len(data)))
                yield pd.DataFrame(rows, columns=[
                    "shard", "key", "ext", "content", "size"])

    return bf.mapInPandas(parse, WDS_SCHEMA)


def samples_view(members: DataFrame) -> DataFrame:
    """Sample-level view: one row per key with ``exts`` (sorted) and
    member count — the completeness gate (drop samples missing a
    modality) without leaving SQL-expressible territory."""
    return members.groupBy("key").agg(
        F.sort_array(F.collect_list("ext")).alias("exts"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("size").alias("total_bytes"))


def write_webdataset(df: DataFrame, out_dir: str, key_col: str,
                     members: Dict[str, str]) -> int:
    """Write one ``.tar`` shard per partition: ``members`` maps the
    member extension to the DataFrame column holding its bytes (binary
    or string; strings are utf-8 encoded). Returns the shard count.
    Repartition beforehand to choose shard size — the shard IS the unit
    downstream tasks parallelize over. Overwrite semantics: existing
    ``.tar`` files in ``out_dir`` are removed first (a re-pack with
    fewer partitions must not leave stale shards for the glob to mix
    back in — the write.mode("overwrite") contract of every other
    sink here).

    Directory lifecycle (mkdir, stale-``.tar`` cleanup, final count)
    goes through the Hadoop FileSystem API (sources/fsutil.py, the
    merge.py pattern), so it operates on the filesystem ``out_dir``'s
    scheme actually names — a driver-local ``os.listdir`` cleanup on a
    cluster without shared POSIX storage would "succeed" against the
    wrong directory and let a re-pack with fewer partitions resurrect
    stale shards into the read glob.

    TAR STAGING CONTRACT: the member writes themselves run on
    executors through ``tarfile`` against the literal ``out_dir`` path,
    so the DATA path still needs ``out_dir`` mounted at the same path
    on every executor (local[] mode, NFS/Lustre, or a fuse-mounted
    object store — the common WebDataset deployment). For a raw
    ``s3a://``-style URI, stage each shard to executor-local tmp and
    upload; the lifecycle half is already scheme-correct."""
    spark = df.sparkSession
    from .fsutil import hadoop_fs, list_file_names
    fs, jvm = hadoop_fs(spark, out_dir)
    HPath = jvm.org.apache.hadoop.fs.Path
    fs.mkdirs(HPath(out_dir))
    for old in list_file_names(spark, out_dir, suffix=".tar"):
        fs.delete(HPath(os.path.join(out_dir, old)), False)
    cols = [key_col] + list(members.values())

    def write_part(it):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        wrote = False
        with tarfile.open(path, "w") as tf:
            for row in it:
                wrote = True
                for ext, col in members.items():
                    data = row[col]
                    if data is None:
                        continue
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    else:
                        data = bytes(data)
                    info = tarfile.TarInfo(f"{row[key_col]}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        if not wrote:                     # no empty shards on disk
            os.remove(path)

    df.select(*cols).foreachPartition(write_part)
    return len(list_file_names(spark, out_dir, suffix=".tar"))
