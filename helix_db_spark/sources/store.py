"""Catalog durability: save/load a GraphCatalog as a parquet layout.

The reference's durability is S3-compatible object storage behind ``--disk``
(helix-cli/src/local_runtime.rs:402-426: MinIO sidecar + S3 env); memory-
first otherwise. Here the same split: the catalog lives as DataFrames, and
this module persists it as a directory of columnar tables any Spark (or
DuckDB) can read back:

    <root>/meta.json                       ordinals, edge endpoints, indexes
    <root>/nodes/<label>/*.parquet         one table per node label
    <root>/edges/<label>/*.parquet         primary copy, clustered by _src
    <root>/edges_by_dst/<label>/*.parquet  dst-clustered copy for in-hops

Scale notes: edge tables are written sorted by ``_src`` (``sortWithinPartitions``
after a range repartition) so out-hop scans cluster by source and parquet
min/max stats prune frontier probes; a second copy sorted by ``_dst`` serves
in-hops the same way (the compiler routes in-legs to it via
``GraphCatalog.edges_directed``). Node tables are written sorted by ``_id``
for the same reason. Label = directory gives free partition pruning on
label-scoped scans.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..catalog import _DST, _ID, _SRC, EdgeMeta, GraphCatalog, IndexEntry


def save_catalog(cat: GraphCatalog, root: str,
                 partitions: Optional[int] = None) -> None:
    meta = {
        "ordinals": cat._ordinals,
        "edges": {label: {"src_label": m.src_label, "dst_label": m.dst_label}
                  for label, m in cat._edge_meta.items()},
        "indexes": [vars(e) for e in cat.indexes.values()],
        "next_local_id": cat._next_local_id,
    }
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    for label, df in cat.nodes().items():
        out = df.repartitionByRange(partitions or df.rdd.getNumPartitions(),
                                    F.col(_ID)) \
                .sortWithinPartitions(_ID)
        out.write.mode("overwrite").parquet(
            os.path.join(root, "nodes", label))
    for label, df in cat.edges().items():
        n = partitions or df.rdd.getNumPartitions()
        out = df.repartitionByRange(n, F.col(_SRC)) \
                .sortWithinPartitions(_SRC)
        out.write.mode("overwrite").parquet(
            os.path.join(root, "edges", label))
        # dst-clustered copy (SURVEY §7 slice 10): in-hops probe on _dst,
        # which the _src-sorted layout can't prune — the second copy costs
        # one extra write but every in-hop scan afterwards skips row groups
        # via _dst min/max. Storage-for-scan-time, the standard trade at
        # 100 TB (cf. secondary indexes / projection-ordered copies).
        by_dst = df.repartitionByRange(n, F.col(_DST)) \
                   .sortWithinPartitions(_DST)
        by_dst.write.mode("overwrite").parquet(
            os.path.join(root, "edges_by_dst", label))


def load_catalog(spark: SparkSession, root: str) -> GraphCatalog:
    with open(os.path.join(root, "meta.json")) as fh:
        meta = json.load(fh)
    cat = GraphCatalog(spark)
    cat._ordinals = dict(meta["ordinals"])
    cat._next_local_id = meta.get("next_local_id", 1)
    nodes_dir = os.path.join(root, "nodes")
    if os.path.isdir(nodes_dir):
        for label in sorted(os.listdir(nodes_dir)):
            cat._nodes[label] = spark.read.parquet(
                os.path.join(nodes_dir, label))
    edges_dir = os.path.join(root, "edges")
    if os.path.isdir(edges_dir):
        for label in sorted(os.listdir(edges_dir)):
            cat._edges[label] = spark.read.parquet(
                os.path.join(edges_dir, label))
            em = meta["edges"].get(label, {})
            cat._edge_meta[label] = EdgeMeta(
                label, em.get("src_label"), em.get("dst_label"))
            dst_copy = os.path.join(root, "edges_by_dst", label)
            if os.path.isdir(dst_copy):
                cat.register_dst_edges(label,
                                       spark.read.parquet(dst_copy))
    for entry in meta.get("indexes", ()):
        cat.create_index(IndexEntry(**entry), if_not_exists=True)
    return cat
