"""Graph analytics over the edge table — the BASELINE.json north-star add-on
("analytics/PageRank via GraphX feasible"), expressed as plain DataFrame
iterations instead of GraphX (RDD-based, not the Spark-first path).

PageRank runs in integer nano-units with integer division so every engine
computes bit-identical results — float mass would accumulate
reduction-order noise across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_UNIT = 1_000_000_000  # initial rank mass per node, in nano-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85


def degree_distribution(edges: DataFrame, graph_id: int) -> DataFrame:
    """(out_degree, n_vertices) histogram for a graph — the canonical sanity
    analytic over an adjacency store."""
    deg = (
        edges.where((F.col("graph_id") == graph_id) & (F.col("state") == 0))
        .groupBy("source_id")
        .agg(F.count(F.lit(1)).alias("out_degree"))
    )
    return deg.groupBy("out_degree").agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))


def pagerank(edges: DataFrame, graph_id: int, iterations: int = 3) -> DataFrame:
    """Integer PageRank: pr' = (1-d)·unit + d · Σ_in (pr div out_degree).

    Each iteration is one join + one aggregation; at cluster scale the edge
    table would be pre-partitioned by source_id so the join is co-located.
    Dangling-node mass is dropped (identically on any engine).
    Output: (node_id, pr) in nano-units."""
    e = edges.where((F.col("graph_id") == graph_id) & (F.col("state") == 0)).select(
        F.col("source_id").alias("src"), F.col("destination_id").alias("dst")
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # the edge↔out_degree join is loop-invariant — attach it once and cache,
    # so each iteration is exactly one join + one aggregation
    e_deg = e.join(out_deg, "src").cache()
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    pr = nodes.select("node", F.lit(PR_UNIT).cast("long").alias("pr"))
    base = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    for _ in range(iterations):
        contrib = (
            e_deg.join(pr.select(F.col("node").alias("src"), "pr"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("pr div out_deg")).alias("in_sum"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"(coalesce(in_sum, 0) * {PR_DAMP_NUM}) div {PR_DAMP_DEN}")
                ).alias("pr"),
            )
        )
    return pr.select(F.col("node").alias("node_id"), F.col("pr"))
