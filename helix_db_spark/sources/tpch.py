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


# TIMESTAMP(NANOS) columns (read as long via nanosAsLong, converted here)
_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def read_tables(spark: SparkSession, sf_dir: str) -> dict:
    out = {}
    for name in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for c in _TS_COLS.get(name, ()):
            if dict(df.dtypes).get(c) == "bigint":  # nanos-as-long
                df = df.withColumn(
                    c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
        out[name] = df
    return out


def load_graph(spark: SparkSession, sf_dir: str) -> GraphCatalog:
    t = read_tables(spark, sf_dir)
    cat = GraphCatalog(spark)

    for name in TABLES:
        df = t[name]
        if name == "lineitem":
            # composite natural key -> synthetic long key (orderkey*8 + line#)
            df = df.withColumn(
                "_lkey", F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber"))
            cat.add_nodes(name, df, key_col="_lkey")
        else:
            cat.add_nodes(name, df, key_col=_KEYS[name])

    def edge(label, df, src, dst, src_key, dst_key, props=None):
        cols = [F.col(src_key).alias("__sk"), F.col(dst_key).alias("__dk")]
        if props:
            cols += [F.col(p) for p in props]
        cat.add_edges(label, df.select(*cols), src_label=src, dst_label=dst,
                      src_key="__sk", dst_key="__dk")

    li = t["lineitem"].withColumn(
        "_lkey", F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber"))

    edge("in_region", t["nation"], "nation", "region",
         "n_nationkey", "n_regionkey")
    edge("in_nation", t["customer"], "customer", "nation",
         "c_custkey", "c_nationkey")
    edge("supplier_in_nation", t["supplier"], "supplier", "nation",
         "s_suppkey", "s_nationkey")
    edge("placed_by", t["orders"], "orders", "customer",
         "o_orderkey", "o_custkey")
    edge("of_order", li, "lineitem", "orders", "_lkey", "l_orderkey")
    edge("of_part", li, "lineitem", "part", "_lkey", "l_partkey")
    edge("of_supplier", li, "lineitem", "supplier", "_lkey", "l_suppkey")
    edge("ordered_part", li, "orders", "part", "l_orderkey", "l_partkey",
         props=["l_linenumber", "l_quantity", "l_extendedprice", "l_discount"])
    edge("by_user", t["events"], "events", "customer", "event_id", "user_id")
    # property-carrying doc->vector edge: the embedding and a text snippet
    # ride on the edge so edge vector/text search has real data
    edge("has_embedding", t["documents"].join(
            t["embeddings"].select(F.col("vec_id"), F.col("embedding")),
            t["documents"]["doc_id"] == F.col("vec_id"), "inner"),
         "documents", "embeddings", "doc_id", "vec_id",
         props=["embedding", "text"])

    return cat
