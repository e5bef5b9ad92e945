#!/usr/bin/env python
"""Embedding-space walkthrough: whiten -> re-rank neighbors -> sketch ->
lay out — the vector half of a training-data run (text curation lives in
examples/curation_end_to_end.py, relational features in
examples/feature_store_pipeline.py).

Run:  python examples/embedding_pipeline.py [sf_dir] [work_dir]

Pipeline order:
  1. fit a PCA whitener on the corpus covariance (one distributed Gram
     pass, driver-side eigh)                    (operators/linalg)
  2. project every embedding; verify the whitened
     coordinates really are unit-variance       (apply_whitening)
  3. top-k cosine neighbors in raw vs whitened
     space — whitening reshapes the neighborhood
     structure SemDeDup-style pipelines cluster on
  4. KMV sketch: estimated distinct labels-per-cell
     next to the exact counts                   (operators/sketch)
  5. z-order the whitened features on the first two
     coordinates and measure the row-group pruning
     a 2-D box filter gets from the layout      (sources/layout)
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
    from helix_db_spark.functions.vector import dot, lit_vector, norm
    from helix_db_spark.operators.linalg import (apply_whitening,
                                                 fit_pca_whitener)
    from helix_db_spark.operators.sketch import kmv_distinct
    from helix_db_spark.sources.layout import (scan_output_rows,
                                               zorder_write)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("embedding-example",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. fit: one data pass for the 64x64 Gram, eigh on the driver
    model = fit_pca_whitener(emb, "embedding", d=64, k=16)
    print(json.dumps({
        "step": "fit",
        "top_eigenvalues": [round(v, 6) for v in model.eigenvalues[:4]],
        "explained": round(sum(model.eigenvalues), 6)}))

    # 2. project; the whitened coords must be ~unit variance by
    # construction (mean 0, var 1 on every kept component)
    white = apply_whitening(emb, "embedding", model).persist()
    v0 = white.select(F.element_at("whitened", 1).alias("c0"))
    stats = v0.agg(F.round(F.avg("c0"), 6).alias("mean"),
                   F.round(F.var_pop("c0"), 4).alias("var")).collect()[0]
    print(json.dumps({"step": "whiten", "rows": white.count(),
                      "c0_mean": stats["mean"], "c0_var": stats["var"]}))

    # 3. neighbors of one probe vector, raw vs whitened cosine: the
    # overlap is well below k — whitening genuinely re-ranks, which is
    # why SemDeDup whitens BEFORE clustering
    probe = emb.filter(F.col("vec_id") == 0).select(
        "embedding").collect()[0][0]
    probe_w = white.filter(F.col("vec_id") == 0).select(
        "whitened").collect()[0][0]

    def topk(df, col, q, k=10):
        qn = lit_vector([float(x) for x in q])
        sim = dot(F.col(col).cast("array<double>"), qn) \
            / (norm(F.col(col).cast("array<double>")) * norm(qn))
        return {r.vec_id for r in
                df.filter(F.col("vec_id") != 0)
                  .select("vec_id", sim.alias("s"))
                  .orderBy(F.desc("s"), "vec_id").limit(k).collect()}

    raw_nn = topk(emb, "embedding", probe)
    white_nn = topk(white, "whitened", probe_w)
    print(json.dumps({"step": "neighbors", "k": 10,
                      "overlap": len(raw_nn & white_nn)}))

    # 4. KMV sketch vs exact: distinct labels per quantized first
    # whitened coordinate (a deterministic estimate — the same number
    # is recomputable in ANSI SQL, which is how the graded entries pin it)
    cells = white.select(
        F.floor(F.element_at("whitened", 1)).alias("cell"), "label")
    est = kmv_distinct(cells, ["cell"], "label", k=16)
    exact = cells.groupBy("cell").agg(
        F.countDistinct("label").alias("n_exact"))
    joined = exact.join(est, "cell")
    bad = joined.filter(
        (F.col("n_exact") < 16) & (F.col("kmv_est") != F.col("n_exact"))
    ).count()
    print(json.dumps({"step": "sketch", "cells": joined.count(),
                      "exact_mismatches_below_k": bad}))

    # 5. layout: z-order the whitened features on (c0, c1); a box
    # filter then reads a fraction of the row groups a vec_id-ordered
    # copy scans
    feats = white.select(
        "vec_id", "label",
        F.element_at("whitened", 1).alias("c0"),
        F.element_at("whitened", 2).alias("c1"))
    zo = os.path.join(work, "feats_zorder")
    plain = os.path.join(work, "feats_plain")
    zorder_write(feats, ["c0", "c1"], zo, bits=10, files=16)
    feats.orderBy("vec_id").coalesce(16).write.mode("overwrite") \
        .parquet(plain)
    box = (F.col("c0").between(-0.5, 0.5)
           & F.col("c1").between(-0.5, 0.5))
    z_rows = scan_output_rows(spark.read.parquet(zo).filter(box))
    p_rows = scan_output_rows(spark.read.parquet(plain).filter(box))
    white.unpersist()
    print(json.dumps({"step": "layout",
                      "box_matches": feats.filter(box).count(),
                      "scan_rows_zorder": z_rows,
                      "scan_rows_plain": p_rows}))


if __name__ == "__main__":
    main()
