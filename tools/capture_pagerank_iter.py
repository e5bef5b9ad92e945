#!/usr/bin/env python
"""Capture the PER-ITERATION physical plan of pagerank_maxnorm (the graded
copurchase_pagerank body). The declared entry localCheckpoints every
iteration, so its own explain() is a lineage-truncated checkpoint scan;
this script no-ops localCheckpoint for one iters=1 call to expose the
real iteration-body plan (joins, exchanges, aggregation) the driver's
plan files must evidence.

Usage: python tools/capture_pagerank_iter.py OUT.txt

STANDALONE-ONLY (ADVICE r13 #4): this script monkey-patches
DataFrame.localCheckpoint/unpersist CLASS-WIDE for the one capture
call (restored in ``finally``). Never import it or run it inside a
shared/bench session — it would silently disable checkpointing for
everything else in-process. The ``__main__`` guard below refuses to
expose the patch as an importable function for exactly that reason.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_path = sys.argv[1]

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from helix_db_spark import get_spark
    from helix_db_spark.operators.graph import pagerank_maxnorm

    spark = get_spark("helix-db-spark-plans",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = (orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
             .select(F.col("o_custkey").alias("src"),
                     F.col("l_partkey").alias("dst")))

    # No-op localCheckpoint (it truncates the very lineage we want to
    # show) and unpersist (the operator releases its caches before
    # returning; keeping them registered shows the InMemoryTableScan
    # shape the loop actually executes with).
    cls = type(edges)  # Spark 4: pyspark.sql.classic.DataFrame subclass
    real_ckpt = cls.localCheckpoint
    real_unp = cls.unpersist
    cls.localCheckpoint = lambda self, eager=True: self  # noqa: ARG005
    cls.unpersist = lambda self, blocking=False: self  # noqa: ARG005
    try:
        r = pagerank_maxnorm(edges, iters=1)
    finally:
        cls.localCheckpoint = real_ckpt
        cls.unpersist = real_unp

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        r.explain(mode="formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path} ({buf.getvalue().count(chr(10))} lines)")


if __name__ == "__main__":
    main()
