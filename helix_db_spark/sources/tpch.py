"""Map the driver's TPC-H-ish parquet tables onto a property graph.

Node labels keep table names and natural columns (columnar, typed — filters
push down to the parquet scan). Foreign keys become directed edge labels;
``ordered_part`` is a property-carrying edge (one per lineitem row) so edge
property steps have something real to chew on.

Graph shape:
  nation      -in_region->        region
  customer    -in_nation->        nation
  supplier    -in_nation(supplier_in_nation)-> nation
  orders      -placed_by->        customer
  lineitem    -of_order->         orders
  lineitem    -of_part->          part
  lineitem    -of_supplier->      supplier
  orders      -ordered_part->     part     (props: l_* from lineitem)
  events      -by_user->          customer
  documents   -has_embedding->    embeddings
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..catalog import GraphCatalog

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


# Timestamp columns. Driver testdata layouts have varied round-to-round:
# INT64 TIMESTAMP(NANOS) (read as long via nanosAsLong, converted here) and
# plain timestamp[us] without tz (read as TIMESTAMP_NTZ). Both normalize to
# session-semantics TimestampType with the engine's UTC contract.
_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _pin_session_confs(spark: SparkSession) -> None:
    """Confs the read path needs on whatever session actually reads —
    including a caller-provided one, not just our own builder (session.py) —
    so the fix travels with the code (round-1 lesson). Both are
    runtime-settable SQL confs, so spark.conf.set works on a live session.

    - nanosAsLong: Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet without it.
    - session.timeZone=UTC: makes the TIMESTAMP_NTZ -> TIMESTAMP cast below
      deterministic (wall clock == UTC instant), matching the DateTime
      contract (UTC epoch millis, SURVEY §1.2) and the DuckDB oracle's naive
      timestamps.
    """
    for k, v in (("spark.sql.legacy.parquet.nanosAsLong", "true"),
                 ("spark.sql.session.timeZone", "UTC")):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down (e.g. Spark Connect policy) — reads of
            #       nanos tables will surface the original error


def read_table(spark: SparkSession, sf_dir: str, name: str):
    _pin_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _TS_COLS.get(name, ()):
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":  # nanos-as-long
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
        elif dt == "timestamp_ntz":  # naive micros; session is pinned UTC
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_tables(spark: SparkSession, sf_dir: str) -> dict:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def load_graph(spark: SparkSession, sf_dir: str) -> GraphCatalog:
    """Register the TPC-H graph lazily: each label's parquet is read on first
    access, so (a) a query touching 2 of 10 tables pays for 2 reads, and
    (b) one unreadable table only breaks queries that touch it. Ordinals are
    pinned up-front in TABLES order (the global-id contract)."""
    cat = GraphCatalog(spark)

    _cache: dict = {}  # per-graph memo so shared tables are read once

    def tbl(name):
        if name not in _cache:
            _cache[name] = read_table(spark, sf_dir, name)
        return _cache[name]

    def li():
        # composite natural key -> synthetic long key (orderkey*8 + line#)
        return tbl("lineitem").withColumn(
            "_lkey", F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber"))

    for name in TABLES:
        if name == "lineitem":
            cat.add_nodes_lazy(name, li, key_col="_lkey")
        else:
            cat.add_nodes_lazy(name, lambda n=name: tbl(n),
                               key_col=_KEYS[name])

    def edge(label, thunk, src, dst, src_key, dst_key, props=None):
        def make():
            df = thunk()
            cols = [F.col(src_key).alias("__sk"), F.col(dst_key).alias("__dk")]
            if props:
                cols += [F.col(p) for p in props]
            return df.select(*cols)
        cat.add_edges_lazy(label, make, src_label=src, dst_label=dst,
                           src_key="__sk", dst_key="__dk")

    edge("in_region", lambda: tbl("nation"), "nation", "region",
         "n_nationkey", "n_regionkey")
    edge("in_nation", lambda: tbl("customer"), "customer", "nation",
         "c_custkey", "c_nationkey")
    edge("supplier_in_nation", lambda: tbl("supplier"), "supplier", "nation",
         "s_suppkey", "s_nationkey")
    edge("placed_by", lambda: tbl("orders"), "orders", "customer",
         "o_orderkey", "o_custkey")
    edge("of_order", li, "lineitem", "orders", "_lkey", "l_orderkey")
    edge("of_part", li, "lineitem", "part", "_lkey", "l_partkey")
    edge("of_supplier", li, "lineitem", "supplier", "_lkey", "l_suppkey")
    edge("ordered_part", li, "orders", "part", "l_orderkey", "l_partkey",
         props=["l_linenumber", "l_quantity", "l_extendedprice", "l_discount"])
    edge("by_user", lambda: tbl("events"), "events", "customer",
         "event_id", "user_id")
    # property-carrying doc->vector edge: the embedding and a text snippet
    # ride on the edge so edge vector/text search has real data
    edge("has_embedding",
         lambda: tbl("documents").join(
             tbl("embeddings").select(F.col("vec_id"), F.col("embedding")),
             F.col("doc_id") == F.col("vec_id"), "inner"),
         "documents", "embeddings", "doc_id", "vec_id",
         props=["embedding", "text"])

    return cat
