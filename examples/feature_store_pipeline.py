#!/usr/bin/env python
"""Feature-store walkthrough: ingest -> filter -> classify -> join ->
co-located serve — the relational half of a training-data run (the text
curation half lives in examples/curation_end_to_end.py, the media half
in examples/media_pipeline.py).

Run:  python examples/feature_store_pipeline.py [sf_dir] [work_dir]

Pipeline order:
  1. dump + re-mount the corpus as line-delimited JSON (the dominant
     LLM dump format)                         (sources/generic.read_documents)
  2. Gopher quality rules as named flags      (textstats.gopher_quality_flags)
  3. train/apply the closed-form Naive Bayes
     filter model on the held-out 20%         (textstats.nb_classify)
  4. keyless ±5-minute band join: purchases
     near any click, per-click rollup         (sampling.interval_join)
  5. write customer+orders as identically-
     bucketed tables; join + rollup with
     ZERO query-time shuffles                 (sources/bucketed)
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
    from helix_db_spark.operators.sampling import interval_join
    from helix_db_spark.operators.textstats import (gopher_quality_flags,
                                                    nb_classify)
    from helix_db_spark.sources.bucketed import bucket_df, colocated_join
    from helix_db_spark.sources.generic import read_documents
    from helix_db_spark.sources.tpch import read_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("feature-store-example",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # 1. jsonl round-trip: dump, then mount with an explicit schema (no
    # inference pass — at 100 TB schema inference is a full read)
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jl = os.path.join(work, "corpus_jsonl")
    docs0.write.mode("overwrite").json(jl)
    docs = read_documents(
        spark, jl, fmt="json",
        schema="doc_id BIGINT, text STRING, lang STRING, "
               "source STRING, n_chars BIGINT")
    print(json.dumps({"step": "ingest", "docs": docs.count()}))

    # 2. Gopher rules: named flags, zero shuffle
    flags = gopher_quality_flags(docs, "doc_id", "text")
    n_wc = flags.filter("wc_ok").count()
    print(json.dumps({"step": "gopher", "wc_ok": n_wc,
                      "kept": flags.filter("keep").count()}))

    # 3. NB filter model: train on 80%, score the held-out 20%
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    pred = nb_classify(train, test, "doc_id", "text", "lang")
    agg = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pred_lang") == F.col("true_lang"), 1)
              .otherwise(0)).alias("ok")).collect()[0]
    frac = round(agg["ok"] / agg["n"], 4) if agg["n"] else None
    print(json.dumps({"step": "classify", "scored": agg["n"],
                      "agree_frac": frac}))

    # 4. keyless band join: purchase context features per click
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("event_id", "ts")
    buys = ev.filter(F.col("event_type") == "purchase") \
             .select(F.col("ts").alias("pts"), "value")
    feats = interval_join(clicks, buys, "ts", "pts", -300.0, 300.0) \
        .groupBy("event_id") \
        .agg(F.count(F.lit(1)).alias("n_nearby"),
             F.round(F.sum("value"), 4).alias("nearby_value"))
    print(json.dumps({"step": "band_join",
                      "clicks_with_context": feats.count()}))

    # 5. bucketed co-located serve: one write-time shuffle, zero
    # query-time exchanges for every subsequent key join/rollup
    pid = os.getpid()
    cust = bucket_df(
        spark,
        spark.read.parquet(f"{sf_dir}/customer.parquet")
             .select("c_custkey", "c_mktsegment"),
        f"ex_bkt_cust_{pid}", "c_custkey",
        os.path.join(work, "bkt_customer"))
    orders = bucket_df(
        spark,
        spark.read.parquet(f"{sf_dir}/orders.parquet")
             .select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
        f"ex_bkt_orders_{pid}", "c_custkey",
        os.path.join(work, "bkt_orders"))
    rollup = colocated_join(cust, orders, "c_custkey") \
        .groupBy("c_custkey", "c_mktsegment") \
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    plan = rollup._jdf.queryExecution().executedPlan().toString()
    print(json.dumps({"step": "bucketed",
                      "customers": rollup.count(),
                      "query_time_shuffles":
                          plan.count("Exchange hashpartitioning")}))


if __name__ == "__main__":
    main()
