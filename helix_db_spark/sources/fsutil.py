"""Driver-side Hadoop FileSystem helpers shared by the sinks that
manage directory lifecycles (merge.py's data-file renames/retirement,
webdataset.py's stale-shard cleanup). Routing list/rename/delete
through the JVM FileSystem API makes the lifecycle correct on whatever
filesystem the path's scheme names (hdfs://, s3a://, abfs://, local),
instead of silently assuming the driver's POSIX view of the path — the
failure mode where a driver-local ``os.listdir`` cleanup "succeeds"
against the wrong (empty local) directory while executors write to the
real one, resurrecting stale files for the next read glob.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str) -> Tuple[object, object]:
    """(org.apache.hadoop.fs.FileSystem for ``path``'s scheme, jvm).
    Scheme-less paths are treated as local files — the same resolution
    Spark's own writers use."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI.create("file://" + path if "://" not in path
                                  else path)
    return jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf), jvm


def list_file_names(spark: SparkSession, path: str,
                    suffix: str = "") -> List[str]:
    """Sorted basenames of the plain files directly under ``path``
    (missing dir => []), optionally filtered by suffix — one
    listStatus RPC, never a data read."""
    fs, jvm = hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p)
                  if st.isFile() and st.getPath().getName().endswith(suffix))
