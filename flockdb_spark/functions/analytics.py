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
    # the edge↔out_degree join is loop-invariant — attach it once and cache
    e_deg = e.join(out_deg, "src").cache()
    base = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    pr_of = f"({base} + (coalesce(in_sum, 0) * {PR_DAMP_NUM}) div {PR_DAMP_DEN})"

    # pr_i(node) = base + d·in_sum_i(node) with in_sum ≡ null for nodes that
    # receive nothing, so only the `in_sum` relation iterates — the dangling-
    # node fill-in happens once at the end, not per iteration.  Iteration 1
    # needs no join at all: uniform initial rank makes every edge's
    # contribution UNIT div out_deg.
    contrib = e_deg.groupBy(F.col("dst").alias("node")).agg(
        F.sum(F.expr(f"{PR_UNIT} div out_deg")).alias("in_sum")
    )
    for _ in range(iterations - 1):
        contrib = (
            e_deg.join(contrib.select(F.col("node").alias("src"), "in_sum"), "src", "left")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr(f"{pr_of} div out_deg")).alias("in_sum"))
        )
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
    )
    return nodes.join(contrib, "node", "left").select(
        F.col("node").alias("node_id"), F.expr(pr_of).cast("long").alias("pr")
    )


def interaction_pairs(events: DataFrame) -> DataFrame:
    """Undirected user-interaction graph: users of consecutive events (by
    event_id) are linked.  Distinct (u, v) with u < v — the unipartite
    fixture for triangle counting (the edge-store graphs are all bipartite).
    One self-join on a sequential key: at scale this is a sort-merge join on
    an already-sorted column, or a window lag over event_id partitions."""
    a = events.select(F.col("event_id").alias("eid"), F.col("user_id").alias("ua"))
    b = events.select((F.col("event_id") - 1).alias("eid"), F.col("user_id").alias("ub"))
    return (
        a.join(b, "eid")
        .where(F.col("ua") != F.col("ub"))
        .select(
            F.least("ua", "ub").alias("u"),
            F.greatest("ua", "ub").alias("v"),
        )
        .distinct()
    )


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-vertex triangle counts over an undirected graph given as distinct
    (u, v) pairs, u < v.

    Degree-ordered orientation (the standard shuffle-minimal scheme): every
    edge points from its lower-(degree, id) endpoint to the higher, so each
    triangle is emitted exactly once from its lowest corner and — the scale
    property that matters — wedge fan-out is Σ C(oriented_out_degree, 2),
    which orientation bounds by O(E^1.5) even on power-law graphs where a
    naive wedge count explodes at the hubs.  Three hash joins, no windows,
    no global sort.  Output: (node_id, n_triangles) for vertices in ≥1
    triangle."""
    deg = (
        pairs.select(F.col("u").alias("n"))
        .unionAll(pairs.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        pairs.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    # u < v always, so the (deg, id) tie-break keeps u→v on equal degrees
    u_first = (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    # the oriented edge list feeds BOTH wedge sides and the closing probe —
    # materialize it once instead of recomputing the degree join three times
    orient = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).cache()
    o1, o2 = orient.alias("o1"), orient.alias("o2")
    wedge = o1.join(
        o2,
        (F.col("o1.a") == F.col("o2.a"))
        & (
            (F.col("o1.db") < F.col("o2.db"))
            | ((F.col("o1.db") == F.col("o2.db")) & (F.col("o1.b") < F.col("o2.b")))
        ),
    ).select(F.col("o1.a").alias("x"), F.col("o1.b").alias("y"), F.col("o2.b").alias("z"))
    tri = wedge.join(
        orient.select(F.col("a").alias("y"), F.col("b").alias("z")), ["y", "z"], "left_semi"
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
