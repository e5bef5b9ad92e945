#!/usr/bin/env python
"""End-to-end corpus curation walkthrough over the driver testdata.

Run:  python examples/curation_end_to_end.py [sf_dir] [work_dir]

Covers, in pipeline order, the operators a training-data run composes:
  1. dataset card + topic map          (what is in this corpus?)
  2. quality / repetition / LM scoring (what is worth keeping?)
  3. full curation recipe -> splits    (gate, decontaminate, dedup, split)
  4. on-disk dedup index + delta batch (how tomorrow's ingest dedups)
  5. sequence packing                  (how it becomes training rows)
Every step prints one summary line; total runtime ~1 min at sf0.001.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from helix_db_spark import get_spark
    from helix_db_spark.operators.dedup import (incremental_dedup,
                                                store_dedup_index)
    from helix_db_spark.operators.pipeline import cluster_topics, \
        curate_corpus
    from helix_db_spark.operators.sampling import pack_documents
    from helix_db_spark.operators.textstats import (dataset_card,
                                                    lm_cross_entropy,
                                                    token_count)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("curation-example",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. corpus overview
    card = dataset_card(docs, "doc_id", "text", by="source") \
        .filter(F.col("is_total") == 1).first()
    topics = cluster_topics(docs, "doc_id", "text").limit(5).collect()
    print(json.dumps({"step": "card", "docs": card["n_docs"],
                      "tokens": card["total_tokens"],
                      "mean_quality": card["mean_quality"],
                      "sample_topics": [t["term"] for t in topics]}))

    # 2. scoring (LM cross-entropy: keep the middle band)
    lm = lm_cross_entropy(docs, "doc_id", "text")
    band = lm.filter(F.col("cross_entropy").between(2.0, 5.0)).count()
    print(json.dumps({"step": "lm_scoring", "scored": lm.count(),
                      "in_band": band}))

    # 3. full curation recipe -> split-partitioned corpus
    kept = curate_corpus(docs, min_quality=0.3)
    out_dir = os.path.join(work, "curated")
    kept.join(docs, on="doc_id").write.mode("overwrite") \
        .partitionBy("split").parquet(out_dir)
    splits = {r["split"]: r["n"] for r in
              kept.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    print(json.dumps({"step": "curate", "kept": sum(splits.values()),
                      "splits": splits, "out": out_dir}))

    # 4. incremental dedup: index today's corpus, classify a delta batch
    idx = os.path.join(work, "dedup_index")
    store_dedup_index(docs, "doc_id", "text", idx)
    delta = docs.limit(3).selectExpr("doc_id + 900000 AS doc_id", "text")
    ann = incremental_dedup(spark, delta, "doc_id", "text", idx)
    kinds = {r["doc_id"]: r["dup_kind"] for r in ann.collect()}
    print(json.dumps({"step": "incremental_dedup", "batch": kinds}))

    # 5. pack curated train docs into context windows
    # shard by source: packing cumsums within shards (the scalable path)
    train = spark.read.parquet(out_dir).filter(F.col("split") == "train") \
        .select("doc_id", "source",
                token_count(F.col("text")).alias("n_tok"))
    packed = pack_documents(train, "doc_id", "n_tok", budget=512,
                            by="source")
    n_bins = packed.agg(F.coalesce(F.max("bin_end") + 1, F.lit(0))
                        .alias("n")).first()["n"]
    print(json.dumps({"step": "pack", "train_docs": train.count(),
                      "bins_in_largest_shard": int(n_bins)}))


if __name__ == "__main__":
    main()
