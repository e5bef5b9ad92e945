#!/usr/bin/env python
"""Keyed-table lifecycle walkthrough: the lakehouse write path around a
training corpus — init -> MERGE -> streaming CDC -> DELETE -> OPTIMIZE
-> time travel -> VACUUM (sources/merge.py + streaming/ingest.py).

Run:  python examples/table_lifecycle.py [sf_dir] [work_dir]

Pipeline order:
  1. lay the documents corpus out as a key-range table (tight footer
     stats make every later step file-prunable)    (write_keyed_table)
  2. MERGE an update batch: corrected text for some docs + brand-new
     docs, rewriting only the touched files        (merge_upsert)
  3. stream two CDC micro-batches through the MERGE sink, in-batch
     duplicate keys resolved by version            (stream_table_merge)
  4. DELETE a key set (the takedown/GDPR path), same pruning
                                                   (merge_delete)
  5. OPTIMIZE: compact the small files narrow merges accumulated
                                                   (compact_table)
  6. time-travel: count rows at v0 vs current      (read_table)
  7. VACUUM: retire files no kept version references
Every step prints one summary JSON line; total runtime ~1 min at
sf0.001.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from helix_db_spark import get_spark
    from helix_db_spark.sources.merge import (compact_table, list_versions,
                                              merge_delete, merge_upsert,
                                              read_table, vacuum,
                                              write_keyed_table)
    from helix_db_spark.streaming.ingest import stream_table_merge

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/table_lifecycle"
    spark = get_spark("table-lifecycle",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    table = os.path.join(work, "docs_table")

    # 1. init: key-range layout -> every file owns a doc_id range
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("ver", F.lit(0).cast("long"))
    write_keyed_table(docs, table, "doc_id", files=8)
    t0 = read_table(spark, table)
    print(json.dumps({"step": "init", "files": len(t0.inputFiles()),
                      "rows": t0.count()}))

    # 2. MERGE: corrected text for one contiguous doc_id neighborhood
    # (+ 5 brand-new docs) — the narrow batch touches ONE range file,
    # the pruning the key-range layout exists to enable
    fixes = (docs.filter((F.col("doc_id") >= 90) & (F.col("doc_id") < 140))
             .withColumn("text", F.upper("text"))
             .withColumn("ver", F.lit(1).cast("long")))
    news = (docs.limit(5)
            .withColumn("doc_id", F.col("doc_id") + 1_000_000)
            .withColumn("ver", F.lit(1).cast("long")))
    st = merge_upsert(spark, table, fixes.unionByName(news), "doc_id")
    print(json.dumps({"step": "merge", **st}))

    # 3. streaming CDC: two micro-batches through the MERGE sink; the
    # second batch re-updates a key from the first (last version wins)
    src = os.path.join(work, "cdc_src")
    cols = read_table(spark, table).columns
    b1 = (docs.limit(3).withColumn("text", F.lit("cdc batch one"))
          .withColumn("ver", F.lit(2).cast("long")).select(*cols))
    b2 = (docs.limit(1).withColumn("text", F.lit("cdc batch two"))
          .withColumn("ver", F.lit(3).cast("long")).select(*cols))
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (spark.readStream.format("parquet")
              .schema(read_table(spark, table).schema)
              .option("maxFilesPerTrigger", "1").load(src))
    q = stream_table_merge(stream, table, "doc_id", latest_by="ver")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = read_table(spark, table).filter(F.col("doc_id") == 0) \
        .select("text", "ver").collect()
    print(json.dumps({"step": "stream",
                      "versions": list_versions(table),
                      "doc0": [tuple(r) for r in first]}))

    # 4. DELETE: takedown of a key set, file-pruned like the merges
    dels = spark.createDataFrame([(7,), (13,)], "doc_id long")
    st = merge_delete(spark, table, dels, "doc_id")
    print(json.dumps({"step": "delete", **st}))

    # 5. OPTIMIZE: narrow merges each added a small file — compact
    st = compact_table(spark, table, "doc_id", files=4)
    print(json.dumps({"step": "compact", **st}))

    # 6. time travel: v0 still has the deleted/pre-merge rows
    v0_rows = read_table(spark, table, version=0).count()
    cur_rows = read_table(spark, table).count()
    print(json.dumps({"step": "time_travel", "v0_rows": v0_rows,
                      "current_rows": cur_rows}))

    # 7. VACUUM: keep only the current version's files
    st = vacuum(spark, table, keep_versions=1)
    print(json.dumps({"step": "vacuum", **st}))


if __name__ == "__main__":
    main()
