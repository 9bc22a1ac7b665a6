"""Batched multi-query set-op evaluation — the Spark-first shape of the
reference's ``select2`` multi-query batch (R18, ``EdgesService.scala:86-100``).

The reference answers N compound queries by running N independent paged
evaluations in parallel.  On Spark, N small set-ops over the same edge table
should be ONE plan — and one PASS: the pair list is unpivoted into a
(source → pair, side) role table, broadcast into a single edge scan, and
every pair's membership flags come out of one hash aggregation.  All three
set operations are then filters over the same flags frame:

    intersection  =  has-A AND has-B
    union         =  any row (the group key set IS the union)
    difference    =  has-A AND NOT has-B

One table scan + one broadcast join + one shuffle for any number of pairs
and any of the three ops — at 100 TB this is the difference between 2N scans
(reference), 2 scans (two tagged sides semi-joined), and 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import EdgeStore
from ..schema import local_df


def _pair_flags(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...]
) -> DataFrame:
    """(a, b, id, ha, hb): for each pair and destination id, whether it is
    reachable from the pair's A side / B side.  Grouping key (a, b, id) is
    already distinct — downstream ops are pure filters, no extra shuffle."""
    ed = (
        store.graph(graph_id)
        .where(F.col("state").isin(list(states)))
        .select("source_id", F.col("destination_id").alias("id"))
    )
    roles = local_df(
        store.spark,
        [(int(a), int(a), int(b), 0) for a, b in pairs]
        + [(int(b), int(a), int(b), 1) for a, b in pairs],
        "src long, a long, b long, side int",
    )
    tagged = ed.join(F.broadcast(roles), ed.source_id == F.col("src")).select(
        "a", "b", "id", "side"
    )
    return tagged.groupBy("a", "b", "id").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("ha"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("hb"),
    )


def batch_intersection(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...] = (0,)
) -> DataFrame:
    """(a, b, id) for every pair's A ∩ B — one scan + one shuffle for all pairs."""
    return (
        _pair_flags(store, graph_id, pairs, states)
        .where("ha = 1 AND hb = 1")
        .select("a", "b", "id")
    )


def batch_union(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...] = (0,)
) -> DataFrame:
    """(a, b, id) for every pair's A ∪ B (dedup by the aggregation key)."""
    return _pair_flags(store, graph_id, pairs, states).select("a", "b", "id")


def batch_difference(
    store: EdgeStore, graph_id: int, pairs: list[tuple[int, int]], states: tuple[int, ...] = (0,)
) -> DataFrame:
    """(a, b, id) for every pair's A − B."""
    return (
        _pair_flags(store, graph_id, pairs, states)
        .where("ha = 1 AND hb = 0")
        .select("a", "b", "id")
    )


def batch_select2(
    store: EdgeStore,
    graph_id: int,
    programs: list[tuple[str, int, int]],
    page_count: int = 20,
    states: tuple[int, ...] = (0,),
) -> DataFrame:
    """The full select2 batch (R18, ``EdgesService.scala:86-100``): N compound
    paged queries — here ``programs`` of mixed op kinds over (a, b) pairs —
    answered in ONE pass.  Every program's membership flags come from the same
    scan + aggregation; the op kind is a per-program filter and the page is a
    per-program window, both over that one flags frame.

    Returns (qix, op, a, b, id): each program's Cursor.Start page — the
    first ``page_count`` ids in the reference's page order, descending
    destination id (``SqlShard.select`` orders DESC unless the cursor walks
    backward, Cursor.Start = -1; ``queries/WhereInQuery.scala`` likewise
    ORDER BY destination_id DESC).
    """
    ops = {"intersection", "union", "difference"}
    bad = [p for p in programs if p[0] not in ops]
    if bad:
        raise ValueError(f"unknown select2 ops: {bad}; expected one of {sorted(ops)}")
    # programs may share an (a, b) pair; dedupe so _pair_flags's broadcast
    # role table carries each role once (duplicates multiply the join output)
    pairs = list(dict.fromkeys((a, b) for _, a, b in programs))
    flags = _pair_flags(store, graph_id, pairs, states)
    prog = local_df(
        store.spark,
        [(i, op, int(a), int(b)) for i, (op, a, b) in enumerate(programs)],
        "qix int, op string, a long, b long",
    )
    # one program per (qix): broadcast the tiny program table onto the flags
    # frame, keep rows the program's op selects, page with a per-program
    # window.  The window repartitions by qix — N·page_count candidate rows
    # at most after AQE, never the edge table.
    tagged = flags.join(F.broadcast(prog), ["a", "b"])
    selected = tagged.where(
        (F.col("op") == "union")
        | ((F.col("op") == "intersection") & (F.col("ha") == 1) & (F.col("hb") == 1))
        | ((F.col("op") == "difference") & (F.col("ha") == 1) & (F.col("hb") == 0))
    )
    w = Window.partitionBy("qix").orderBy(F.desc("id"))
    return (
        selected.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= page_count)
        .select("qix", "op", "a", "b", "id")
    )
