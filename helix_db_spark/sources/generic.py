"""Config-driven graph loading: mount any columnar dataset as a property
graph, in any format Spark reads (parquet / json / csv / orc), lazily per
label like sources/tpch.py.

A user of the reference ingests rows through the write API; on Spark the
natural bulk path is "point the engine at tables". The config is plain
data (JSON-serializable) so a deployment can ship it next to the data:

    {
      "nodes": {
        "user":  {"path": ".../users",  "format": "json", "key": "user_id"},
        "movie": {"path": ".../movies.csv", "format": "csv",
                  "options": {"header": "true", "inferSchema": "true"},
                  "key": "movie_id"}
      },
      "edges": {
        "rated": {"path": ".../ratings", "format": "parquet",
                  "src": ["user", "user_id"], "dst": ["movie", "movie_id"],
                  "props": ["rating", "ts"]}
      }
    }

Node ordinals are pinned in config order (global-id contract); each table
is read on first access, so a broken path only breaks queries touching it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import GraphCatalog


def _reader(spark: SparkSession, spec: dict) -> DataFrame:
    fmt = spec.get("format", "parquet")
    reader = spark.read.format(fmt)
    for k, v in (spec.get("options") or {}).items():
        reader = reader.option(k, v)
    if spec.get("schema"):
        reader = reader.schema(spec["schema"])
    return reader.load(spec["path"])


def load_graph_config(spark: SparkSession, config: dict) -> GraphCatalog:
    """Build a lazily-loaded GraphCatalog from a config dict (see module
    docstring). Node spec: path, format?, options?, schema?, key.
    Edge spec: path..., src: [label, column], dst: [label, column],
    props?: [columns]."""
    cat = GraphCatalog(spark)
    nodes = config.get("nodes") or {}
    edges = config.get("edges") or {}

    for label in nodes:  # pin ordinals in config order
        cat.ordinal(label)

    for label, spec in nodes.items():
        key = spec["key"]
        cat.add_nodes_lazy(
            label,
            (lambda sp=spec: _reader(spark, sp)),
            key_col=key)

    for label, spec in edges.items():
        src_label, src_col = spec["src"]
        dst_label, dst_col = spec["dst"]
        props = list(spec.get("props") or [])

        def make(sp=spec, sc=src_col, dc=dst_col, pr=tuple(props)):
            df = _reader(spark, sp)
            cols = [F.col(sc).alias("__sk"), F.col(dc).alias("__dk")]
            cols += [F.col(p) for p in pr]
            return df.select(*cols)

        cat.add_edges_lazy(label, make, src_label=src_label,
                           dst_label=dst_label,
                           src_key="__sk", dst_key="__dk")
    return cat


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet",
                   id_col: str = "doc_id", text_col: str = "text",
                   schema: str = None, **options) -> DataFrame:
    """Mount any Spark-readable corpus as the canonical ``(doc_id, text,
    ...)`` shape every pipeline operator consumes — the on-ramp for
    jsonl/csv/orc/parquet document dumps without bespoke glue.

    ``id_col``/``text_col`` name the SOURCE columns; they are renamed to
    the canonical names and every other column passes through. A missing
    id column gets a deterministic surrogate
    (monotonically_increasing_id — partition-stable for a fixed file
    layout; supply a real id for cross-run stability, every dedup/split
    operator keys on it). Text-bearing formats default sensible options
    (csv: header on; json covers jsonl — Spark reads line-delimited by
    default).
    """
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if text_col != "text":
        df = df.withColumnRenamed(text_col, "text")
    if id_col in df.columns:
        if id_col != "doc_id":
            df = df.withColumnRenamed(id_col, "doc_id")
    else:
        df = df.withColumn("doc_id", F.monotonically_increasing_id())
    return df
