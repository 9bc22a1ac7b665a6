"""Batched multi-query set-op evaluation — the Spark-first shape of the
reference's ``select2`` multi-query batch (R18, ``EdgesService.scala:86-100``).

The reference answers N compound queries by running N independent paged
evaluations in parallel.  On Spark, N small set-ops over the same edge table
should be ONE plan: broadcast the (tiny) pair list, join it into the edge
scan, and evaluate every pair's intersection/union/difference in a single
pass with one shuffle — at 100 TB this turns N table scans into one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeStore


def _sides(store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...]):
    ed = (
        store.graph(graph_id)
        .where(F.col("state").isin(list(states)))
        .select("source_id", F.col("destination_id").alias("id"))
    )
    pairs_df = store.spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "a long, b long")
    # tag every edge of an a-side / b-side source with its pair (broadcast join)
    a_side = ed.join(F.broadcast(pairs_df), ed.source_id == F.col("a")).select("a", "b", "id")
    b_side = ed.join(F.broadcast(pairs_df), ed.source_id == F.col("b")).select(
        F.col("a").alias("a2"), F.col("b").alias("b2"), F.col("id").alias("id2")
    )
    return a_side, b_side


def batch_intersection(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...] = (0,)
) -> DataFrame:
    """(a, b, id) for every pair's A ∩ B — one shuffle for all pairs."""
    a_side, b_side = _sides(store, graph_id, pairs, states)
    cond = (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2")) & (F.col("id") == F.col("id2"))
    return a_side.join(b_side, cond, "left_semi")


def batch_union(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...] = (0,)
) -> DataFrame:
    """(a, b, id) for every pair's A ∪ B (dedup)."""
    a_side, b_side = _sides(store, graph_id, pairs, states)
    both = a_side.unionByName(
        b_side.select(F.col("a2").alias("a"), F.col("b2").alias("b"), F.col("id2").alias("id"))
    )
    return both.distinct()


def batch_difference(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...] = (0,)
) -> DataFrame:
    """(a, b, id) for every pair's A − B."""
    a_side, b_side = _sides(store, graph_id, pairs, states)
    cond = (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2")) & (F.col("id") == F.col("id2"))
    return a_side.join(b_side, cond, "left_anti")
