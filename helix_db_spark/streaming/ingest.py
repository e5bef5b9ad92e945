"""Structured Streaming surface: incremental ingestion + streaming analytics.

Net-new relative to the reference (SURVEY §2.14: it has no streaming
operators) — this is the Spark-native growth path: the same event/graph
tables the batch engine queries, fed incrementally.

Three pieces, each a thin declarative plan so Catalyst/the streaming engine
handle state, retries and exactly-once with checkpoints:

- ``stream_events``: file/parquet-backed streaming reader with schema
  enforcement (at cluster scale the source would be Kafka — swap
  ``format``; the downstream plans are identical).
- windowed aggregation with a watermark (late data handled, state bounded)
  — the incremental twin of ``entry_queries.events_window_agg``.
- gap sessionization via ``session_window`` — the incremental twin of
  ``entry_queries.events_sessionize``.
- ``stream_graph_upserts``: foreachBatch upsert of node rows into a
  GraphCatalog — micro-batch CDC into the label-partitioned store.

All sinks default to ``memory`` for deterministic local tests
(``processAllAvailable()`` drives a parquet directory to completion
synchronously); production callers pass their own writeStream options.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_events(spark: SparkSession, path: str,
                  schema: str = EVENTS_SCHEMA) -> DataFrame:
    """Streaming events source. Parquet dir for tests; the plan is
    source-agnostic (Kafka at scale: same columns out of from_json)."""
    return (spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", "4")  # bounded micro-batches
            .load(path))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count+sum per event_type with late-data watermark.

    The watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted — mandatory for unbounded runs at
    cluster scale.
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("count"),
                 F.sum("value").alias("total"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "count", "total"))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user: session_window closes a session after
    ``gap`` inactivity. Incremental equivalent of the batch lag+cumsum
    sessionization (entry_queries.events_sessionize)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total"))
            .select(F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "user_id", "n_events", "total"))


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drive a streaming plan over a bounded source to completion into an
    in-memory table (deterministic test sink)."""
    q = (df.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_graph_upserts(events: DataFrame, catalog, label: str,
                         key_col: str,
                         transform: Optional[Callable[[DataFrame], DataFrame]]
                         = None):
    """Micro-batch CDC: upsert streaming rows into a catalog node label.

    foreachBatch gives exactly-once per micro-batch with a checkpoint; the
    upsert is last-writer-wins on ``key_col`` (anti-join + union — the
    Delta-less MERGE). Returns the StreamingQuery.
    """
    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        rows = transform(batch_df) if transform is not None else batch_df
        if not rows.columns:
            return
        existing = catalog.nodes(label).get(label)
        if existing is None:
            catalog.add_nodes(label, rows, key_col=key_col)
            return
        from ..catalog import _ID, global_id
        incoming = rows.withColumn(
            _ID, global_id(catalog.ordinal(label), F.col(key_col)))
        merged = existing.join(incoming.select(_ID), on=_ID,
                               how="left_anti").unionByName(
            incoming, allowMissingColumns=True)
        # cut streaming lineage before replacing the served table
        catalog.replace_nodes(label, merged.localCheckpoint(eager=True))

    return (events.writeStream.outputMode("update")
            .foreachBatch(upsert).start())
