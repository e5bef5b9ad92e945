"""SparkSession factory tuned for the helix_db_spark engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores), but
every knob here is chosen for cluster scale: AQE on (runtime re-planning +
skew-join splitting), partition coalescing, Arrow for the few pandas-UDF
paths, and a broadcast threshold sized so dimension tables (region/nation/
small frontiers) broadcast instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Sized for local testing; on a real cluster this scales with cores.
    "spark.sql.shuffle.partitions": "32",
    # Dimension tables and small traversal frontiers should broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow transfer for pandas UDFs (vector math, multimodal decode).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Whole-stage-codegen methods past HotSpot's 8KB JIT cap never get
    # JIT-compiled and run interpreted (slower than Spark's virtual-function
    # fallback). Cap matches the JIT so huge generated methods fall back.
    "spark.sql.codegen.hugeMethodLimit": "8000",
    # Readable timestamps across engines.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # driver testdata stores TIMESTAMP(NANOS); read as long, convert at load
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": "16g",
}


def get_spark(app_name: str = "helix-db-spark", **overrides: str) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
