#!/usr/bin/env python
"""Common Crawl-shaped ingestion walkthrough: WARC archives -> clean
deduplicated text corpus.

Run:  python examples/warc_to_corpus.py [sf_dir] [work_dir]

Covers, in pipeline order, the front half of a crawl-based training run
(the back half — scoring, curation, packing — continues in
examples/curation_end_to_end.py):
  1. write per-partition .warc.gz fixtures   (stand-in for a crawl dump)
  2. file-parallel WARC record parse         (sources/warc.read_warc)
  3. HTTP/HTML -> clean text extraction      (sources/warc.extract_text)
  4. language ID + quality gate              (textstats)
  5. exact dedup of the extracted corpus     (dedup)
Every step prints one summary line; total runtime <1 min at sf0.001.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from helix_db_spark import get_spark
    from helix_db_spark.operators.dedup import exact_dedup
    from helix_db_spark.operators.textstats import (detect_language,
                                                    quality_score)
    from helix_db_spark.sources.warc import (extract_text, read_warc,
                                             write_warc_fixture)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("warc-example",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. a crawl-dump stand-in: every partition writes one .warc.gz of
    # HTTP-wrapped HTML pages (per-record gzip members)
    root = os.path.join(work, "crawl")
    write_warc_fixture(docs, "doc_id", "text", root, partitions=3)
    files = [f for f in os.listdir(root) if f.endswith(".warc.gz")]
    print(json.dumps({"step": "fixture", "archives": len(files)}))

    # 2. file-parallel record parse
    recs = read_warc(spark, root).filter(F.col("warc_type") == "response")
    n = recs.count()
    ok = recs.filter(F.col("http_status") == 200).count()
    print(json.dumps({"step": "parse", "records": n, "http_200": ok}))

    # 3. HTML -> text
    texts = extract_text(recs, "payload", "text") \
        .select(F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
                .cast("long").alias("doc_id"), "text")
    print(json.dumps({"step": "extract", "docs": texts.count()}))

    # 4. language + quality gates (the first crawl filters)
    gated = (texts
             .withColumn("lang", detect_language(F.col("text")))
             .filter(F.col("lang") == "en")
             .withColumn("quality", quality_score(F.col("text")))
             .filter(F.col("quality") >= 0.3))
    print(json.dumps({"step": "gate", "kept": gated.count()}))

    # 5. exact dedup of the extracted corpus
    kept = exact_dedup(gated, "doc_id", "text")
    out = os.path.join(work, "corpus")
    kept.select("doc_id", "text").write.mode("overwrite").parquet(out)
    print(json.dumps({"step": "dedup",
                      "survivors": spark.read.parquet(out).count()}))


if __name__ == "__main__":
    main()
