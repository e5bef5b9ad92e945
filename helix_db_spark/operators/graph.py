"""Graph analytics over the catalog's edge tables (_src/_dst global ids).

The traversal surface (plans/compiler.py) answers per-query navigation;
these operators answer corpus-level structural questions a graph-DB user
asks next: degree profiles (exact, oracle-graded) and PageRank
(iterative, tests-gated — float fixpoints have no deterministic SQL
oracle). Both stay distributed: degrees are one partial-aggregable
groupBy; PageRank is join + partial-agg per iteration with only scalar
state (N, dangling mass) on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import _DST, _SRC


def node_degrees(edges: DataFrame, direction: str = "out") -> DataFrame:
    """(node, degree) for nodes with >= 1 edge in ``direction``
    ('out' = by _src, 'in' = by _dst, 'both' = union). One groupBy on the
    endpoint — partial-aggregable, uniform unless the graph itself is
    skewed."""
    if direction == "both":
        ends = edges.select(F.col(_SRC).alias("node")).unionAll(
            edges.select(F.col(_DST).alias("node")))
    else:
        col = _SRC if direction == "out" else _DST
        ends = edges.select(F.col(col).alias("node"))
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def degree_distribution(edges: DataFrame,
                        direction: str = "out") -> DataFrame:
    """(degree, n_nodes) histogram — the structural fingerprint used for
    skew planning (a heavy tail here predicts hot keys in every
    edge-keyed shuffle). Two partial-aggregable groupBys; the second
    input is one row per node, the output one row per distinct degree."""
    return (node_degrees(edges, direction)
            .groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes")))


def pagerank(edges: DataFrame, iters: int = 10,
             damping: float = 0.85) -> DataFrame:
    """Damped PageRank over the edge list, ``iters`` fixed power
    iterations. Per iteration: contributions = rank/out_degree shipped
    along edges (join on _src, partial-agg by _dst), dangling mass (nodes
    with no out-edges) redistributed uniformly. Driver state is two
    scalars per iteration (N once, the dangling sum) — the same bounded
    probe-planning pattern as lsh_topk; the rank table itself never
    leaves the cluster. Ranks are localCheckpointed per iteration to keep
    lineage flat at depth (use reliable checkpointing on a real cluster —
    the ADVICE r4 executor-loss tradeoff). Returns (node, rank); ranks
    sum to 1. Float fixpoint => tests-gated, no SQL oracle.
    """
    nodes = (edges.select(F.col(_SRC).alias("node"))
             .unionAll(edges.select(F.col(_DST).alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(_SRC).agg(F.count(F.lit(1)).alias("_od"))
    # edges annotated once with the sender's out-degree; reused every round
    ann = edges.select(_SRC, _DST).join(out_deg, on=_SRC).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (ann.join(ranks, ann[_SRC] == ranks["node"])
                      .select(F.col(_DST).alias("node"),
                              (F.col("rank") / F.col("_od")).alias("_c"))
                      .groupBy("node").agg(F.sum("_c").alias("_in")))
        dangling = (ranks.join(out_deg, ranks["node"] == out_deg[_SRC],
                               "left_anti")
                         .agg(F.sum("rank")).collect()[0][0] or 0.0)
        spread = damping * dangling / n
        ranks = (nodes.join(contrib, on="node", how="left")
                      .select("node",
                              (F.lit(base + spread) + F.lit(damping)
                               * F.coalesce(F.col("_in"), F.lit(0.0)))
                              .alias("rank"))
                      .localCheckpoint())
    return ranks
