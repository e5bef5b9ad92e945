"""Z-order (Morton-curve) data layout: multi-dimensional clustering so
parquet row-group statistics prune on EVERY filtered dimension at once.

A table sorted by one key prunes scans on that key only; a 100 TB event
table queried by (user, value), (time, type), ... pays a full scan for
every dimension it is NOT sorted by. Interleaving the bits of several
normalized columns into one Morton key and range-partitioning + sorting
by it keeps rows that are close in ALL dimensions inside the same file
and row group, so each row group's per-column min/max stats cover a tight
hyper-rectangle and the parquet reader's predicate pushdown skips most of
the data for any box filter — the same layout trick Delta Lake's OPTIMIZE
ZORDER BY and ClickHouse's mortonEncode indexes use, expressed here with
nothing but built-in column expressions (shiftleft/shiftright/bitwise-and
— zero UDFs, whole-stage-codegen friendly) and a repartitionByRange
write.

Normalization maps each column onto ``2^bits`` equi-width cells between
its observed min and max (computed once at write time — this is a layout
BUILD, the same eager-action budget as the index builds in
sources/store.py). Equi-width keeps the cell math a pure expression;
heavily skewed columns can be pre-transformed (log, rank) by the caller.

The reference engine has no analogous surface (its LMDB storage is
single-key-ordered); this module belongs to the 100 TB operational layer
the Spark engine adds. Evidence that the pruning is real (scan-level
numOutputRows at equal file counts, z-ordered vs time-ordered layout)
lives in tests/test_layout.py and PLANS.md.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto integer cells [0, 2^bits): equi-width
    between the observed [lo, hi], clamped (values at hi land in the
    top cell; a degenerate constant column collapses to cell 0)."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) \
        / F.lit(float(hi - lo)) * F.lit(float(n))
    return F.least(F.lit(n), F.greatest(
        F.lit(0), F.floor(scaled))).cast("long")


def zorder_key(cells: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each cell column into one
    Morton key (column i contributes bit j to key position
    ``j * ncols + i``). Pure bitwise expression tree — ncols*bits
    shift/and/or terms, all JVM-side."""
    ncols = len(cells)
    if ncols * bits > 62:
        raise ValueError(f"{ncols} cols x {bits} bits overflows int64")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cells):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * ncols + i))
    return key


def zorder_by(df: DataFrame, cols: Sequence[str], bits: int = 12,
              ranges: Optional[List[Tuple[float, float]]] = None,
              out_col: str = "_zkey") -> DataFrame:
    """Attach the Morton key for ``cols`` as ``out_col``. ``ranges``
    supplies (min, max) per column; when omitted they are computed with
    one agg over ``df`` NOW (write-time build cost, like an index
    build — pass explicit ranges to stay fully lazy)."""
    if ranges is None:
        row = df.agg(*[f(c) for c in cols
                       for f in (F.min, F.max)]).first()
        if row is None or any(v is None for v in row):
            bad = [c for i, c in enumerate(cols)
                   if row is None or row[2 * i] is None]
            raise ValueError(
                f"cannot infer z-order ranges: no rows or all-NULL "
                f"column(s) {bad} — pass explicit ranges= or fix the "
                f"input")
        ranges = [(float(row[2 * i]), float(row[2 * i + 1]))
                  for i in range(len(cols))]
    cells = [_cell(F.col(c), lo, hi, bits)
             for c, (lo, hi) in zip(cols, ranges)]
    return df.withColumn(out_col, zorder_key(cells, bits))


def zorder_write(df: DataFrame, cols: Sequence[str], path: str,
                 bits: int = 12, files: int = 32,
                 ranges: Optional[List[Tuple[float, float]]] = None
                 ) -> None:
    """Write ``df`` to ``path`` clustered by the Morton key of ``cols``:
    repartitionByRange on the key (contiguous z-ranges per file, range
    boundaries from Spark's reservoir sample of the key) then sort
    within partitions, so every row group's min/max stats are tight on
    every z-ordered dimension. The key itself is dropped — layout is a
    storage property, not a schema change. ``files`` sizes the output
    (at scale: table_bytes / target_file_bytes)."""
    if "_zkey" in df.columns:
        raise ValueError(
            "_zkey is reserved by zorder_write (a pre-existing column "
            "of that name would be silently dropped from the rewrite); "
            "rename it first")
    keyed = zorder_by(df, cols, bits=bits, ranges=ranges)
    (keyed.repartitionByRange(files, F.col("_zkey"))
          .sortWithinPartitions("_zkey")
          .drop("_zkey")
          .write.mode("overwrite").parquet(path))


def compact_parquet(spark, in_path: str, out_path: str,
                    target_mb: int = 256) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_mb``-sized files. Streaming sinks, per-batch appends and
    over-parallel writes leave thousands of KB-scale files whose
    open/footer costs dominate scans at 100 TB (and whose row groups are
    too small for statistics pruning to matter); compaction is the
    standing maintenance task every table format schedules (Delta
    OPTIMIZE, Iceberg rewrite_data_files). ``coalesce`` (not
    repartition) merges partitions without a shuffle — per-file
    ordering survives, so a compacted z-ordered table keeps its
    clustering. Sizes come from the scan's own file listing; local
    paths are stat'd directly (for object stores, route the size probe
    through the Hadoop FileSystem API — listing semantics differ, the
    plan does not). Returns {in_files, out_files, bytes}."""
    import math as _math
    import os

    from urllib.parse import unquote, urlparse

    def local_path(uri: str) -> str:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            raise ValueError(
                f"compact_parquet sizes files via the local filesystem; "
                f"{parsed.scheme}:// paths need the Hadoop FileSystem "
                f"API (got {uri})")
        # inputFiles() percent-encodes (spaces -> %20); undo it
        return unquote(parsed.path or uri)

    local_path(in_path)               # refuse remote schemes up front
    df = spark.read.parquet(in_path)
    total = 0
    files = df.inputFiles()
    for uri in files:
        total += os.path.getsize(local_path(uri))
    n = max(1, _math.ceil(total / (target_mb * 1024 * 1024)))
    df.coalesce(n).write.mode("overwrite").parquet(out_path)
    out_n = len(spark.read.parquet(out_path).inputFiles())
    return {"in_files": len(files), "out_files": out_n, "bytes": total}


def scan_output_rows(df: DataFrame) -> int:
    """Run ``df`` to completion and return the file-scan operator's
    ``number of output rows`` metric — rows surviving parquet row-group
    pruning, BEFORE the post-scan filter. The measurement used to prove
    a layout actually skips data (tests/test_layout.py, PLANS.md).

    Executes the DataFrame's OWN QueryExecution (a noop sink would plan
    a separate execution and leave this plan's metric accumulators at
    zero); ``executedPlan().execute()`` runs the physical plan JVM-side
    without shipping rows to Python. AQE wrapping is unwrapped
    explicitly — AdaptiveSparkPlanExec and QueryStageExec are LEAF
    nodes to collectLeaves(), so a naive leaf walk over an adaptive
    plan (any join/aggregate) would silently report 0. Raises if no
    metric-bearing scan leaf is found at all: a measurement helper must
    never answer 0 because it looked in the wrong place."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()          # JVM-side action on THIS plan tree

    found = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.finalPhysicalPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        kids = node.children()
        if kids.isEmpty():
            m = node.metrics()
            if m.contains("numOutputRows"):
                found.append(int(m.apply("numOutputRows").value()))
            return
        it = kids.iterator()
        while it.hasNext():
            walk(it.next())

    walk(plan)
    if not found:
        raise ValueError("no metric-bearing scan leaf in the executed "
                         "plan — cannot measure scanned rows")
    return sum(found)
