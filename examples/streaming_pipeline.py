#!/usr/bin/env python
"""Streaming walkthrough: one bounded parquet source driven through the
engine's Structured Streaming operators — the incremental half of the
relational pipeline (examples/feature_store_pipeline.py is the batch
half; curation and media live in the other two examples).

Run:  python examples/streaming_pipeline.py [sf_dir] [work_dir]

Pipeline order:
  1. watermarked tumbling-window counts, append mode into
     a file sink (the production shape)        (streaming/ingest.windowed_counts)
  2. gap-based session windows                 (streaming/ingest.sessionize)
  3. stream-stream band join: purchases within
     ±5 min of any click, inner                (streaming/ingest.stream_interval_join)
  4. the same join left-outer: clicks with NO
     nearby purchase keep a NULL row (flushed
     by the final no-data micro-batch)
Every step prints one summary JSON line; total runtime ~1 min at
sf0.001.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from helix_db_spark import get_spark
    from helix_db_spark.sources.tpch import read_table
    from helix_db_spark.streaming import ingest

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("streaming-pipeline-example",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # bounded source: re-materialize events with a plain timestamp
    # column (testdata parquet stores TIMESTAMP(NANOS))
    src = os.path.join(work, "events_src")
    read_table(spark, sf_dir, "events").coalesce(1) \
        .write.mode("overwrite").parquet(src)

    # 1. watermarked windowed counts -> parquet file sink, append mode
    agg = ingest.windowed_counts(ingest.stream_events(spark, src),
                                 window="1 hour", watermark="2 hours")
    sink = os.path.join(work, "win_sink")
    q = (agg.writeStream.outputMode("append").format("parquet")
         .option("path", os.path.join(sink, "out"))
         .option("checkpointLocation", os.path.join(sink, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wins = spark.read.parquet(os.path.join(sink, "out"))
    print(json.dumps({"step": "windowed",
                      "finalized_windows": wins.count()}))

    # 2. session windows (30-minute gap) into a memory sink
    ingest.run_to_memory(
        ingest.sessionize(ingest.stream_events(spark, src)), "ex_sess")
    n_sess = spark.sql("SELECT count(*) AS n FROM ex_sess").collect()[0]["n"]
    print(json.dumps({"step": "sessionize", "sessions": n_sess}))

    # 3. stream-stream band join, inner
    ev = ingest.stream_events(spark, src)
    clicks = ev.filter(F.col("event_type") == "click") \
               .select(F.col("event_id").alias("click_id"), "ts")
    buys = ev.filter(F.col("event_type") == "purchase") \
             .select(F.col("ts").alias("pts"), "value")
    inner = ingest.stream_interval_join(clicks, buys, "ts", "pts",
                                        -300.0, 300.0)
    ingest.run_to_memory(inner.select("click_id", "value"), "ex_ssj")
    pairs = spark.sql("SELECT count(*) AS n FROM ex_ssj").collect()[0]["n"]
    print(json.dumps({"step": "band_join_inner", "pairs": pairs}))

    # 4. left-outer: unmatched clicks flush as NULL rows
    outer = ingest.stream_interval_join(clicks, buys, "ts", "pts",
                                        -300.0, 300.0, how="left_outer")
    ingest.run_to_memory(outer.select("click_id", "value"), "ex_ssjo")
    row = spark.sql("SELECT count(*) AS n, "
                    "sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nn "
                    "FROM ex_ssjo").collect()[0]
    print(json.dumps({"step": "band_join_outer", "rows": row["n"],
                      "unmatched_clicks": row["nn"]}))


if __name__ == "__main__":
    main()
