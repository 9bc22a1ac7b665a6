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
from .algebra import (
    Difference,
    Intersection,
    QueryNode,
    Simple,
    Term,
    Union,
    WhereIn,
    _flat_leaves,
)


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


def batch_edge_pages(
    store: EdgeStore,
    queries: list[tuple["Term", tuple[int, ...] | None, int]],
) -> DataFrame:
    """N single-term FULL-EDGE Start pages from ONE edge scan — the batch
    ``selectEdges`` (``Flockdb.thrift:158-160`` takes ``list<EdgeQuery>``;
    ``EdgesService.scala:102-119`` answers them per-query; here the whole
    batch is one job).

    Each query is ``(term, destination_ids | None, page_count)`` — a Simple
    or intersectEdges (R10) leaf.  One coarse-filtered scan tags each edge
    row with every query index it satisfies (a row CAN serve two queries);
    pages are per-query windows in the reference's Start-page order —
    position DESC with the page's id column (destination for forward terms,
    source for backward) as tiebreak (``SqlShard.select``'s default
    direction).

    Returns (qix, rn, <edge cols>) with ``rn`` ≤ page_count+1 — the +1 row
    is the caller's has-more probe (``SqlShard.scala:263-278``'s same-round-
    trip trick).  At 100 TB this is one pruned scan + one N·page-sized
    shuffle for any number of queries, vs N scans in the reference."""
    preds = []
    for term, dest_ids, _count in queries:
        p = (
            (F.col("graph_id") == term.graph_id)
            & (F.col(term.vertex_col) == term.source_id)
            & F.col("state").isin(list(term.states))
        )
        if dest_ids is not None:
            p = p & F.col(term.id_col).isin([int(d) for d in dest_ids])
        preds.append(p)
    coarse = preds[0]
    for p in preds[1:]:
        coarse = coarse | p
    tagged = (
        store.edges.where(coarse)
        .withColumn("qix", F.explode(F.array(*[F.when(p, F.lit(i)) for i, p in enumerate(preds)])))
        .where(F.col("qix").isNotNull())
    )
    spec = local_df(
        store.spark,
        [
            (i, int(count), bool(not term.forward))
            for i, (term, _dest, count) in enumerate(queries)
        ],
        "qix int, page_count int, backward boolean",
    )
    pid = F.when(F.col("backward"), F.col("source_id")).otherwise(
        F.col("destination_id")
    )
    w = Window.partitionBy("qix").orderBy(F.desc("position"), F.desc("_pid"))
    return (
        tagged.join(F.broadcast(spec), "qix")
        .withColumn("_pid", pid)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("page_count") + 1)
        .drop("page_count", "backward", "_pid")
    )


def batch_flat_pages(
    store: EdgeStore, programs: list[tuple[QueryNode, int]]
) -> DataFrame | None:
    """N compound queries' Cursor.Start pages from ONE edge scan.

    The general form of :func:`batch_select2` — each program is any
    flattenable set-op tree (``algebra._flat_leaves``: Simple / inline
    WhereIn leaves, any mix of graphs, directions, state filters, any
    depth).  Every leaf across every program becomes one membership tag in
    a single coarse-filtered scan; per-(program, id) flags come out of one
    hash aggregation; each program's tree is a boolean over its own flags;
    pages are per-program windows in the reference's Start-page order
    (destination id DESC, ``SqlShard.select``'s default direction).

    Returns (qix, id, rn) with ``rn`` ≤ page_count+1 — the +1 row is the
    caller's has-more probe (same trick as ``SqlShard.scala:263-278``), or
    ``None`` if any program is not flattenable (caller falls back to
    per-program evaluation).

    This is the reference's real N-query batch shape
    (``Flockdb.thrift:151-152`` takes the whole query list): N compound
    queries are one scan + one shuffle instead of N× both.
    """
    flat = [_flat_leaves(tree) for tree, _ in programs]
    if any(
        leaves is None or not isinstance(tree, (Intersection, Union, Difference))
        for leaves, (tree, _) in zip(flat, programs)
    ):
        return None

    preds, entries, base = [], [], 0
    starts: list[int] = []
    for qix, leaves in enumerate(flat):
        starts.append(base)
        for j, leaf in enumerate(leaves):
            t = leaf.term
            p = (
                (F.col("graph_id") == t.graph_id)
                & (F.col(t.vertex_col) == t.source_id)
                & F.col("state").isin(list(t.states))
            )
            if isinstance(leaf, WhereIn):
                p = p & F.col(t.id_col).isin(list(leaf.in_ids))
            preds.append(p)
            entries.append(
                F.when(
                    p,
                    F.struct(
                        F.lit(qix).alias("qix"),
                        F.lit(base + j).alias("leaf"),
                        F.col(t.id_col).alias("id"),
                    ),
                )
            )
        base += len(leaves)

    coarse = preds[0]
    for p in preds[1:]:
        coarse = coarse | p
    tagged = (
        store.edges.where(coarse)
        .select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.qix", "e.leaf", "e.id")
    )
    nleaves = base
    flags = tagged.groupBy("qix", "id").agg(
        *[
            F.max(F.when(F.col("leaf") == i, 1).otherwise(0)).alias(f"f{i}")
            for i in range(nleaves)
        ]
    )

    def expr(n: QueryNode, counter) -> "F.Column":
        if isinstance(n, (Simple, WhereIn)):
            return F.col(f"f{next(counter)}") == 1
        left, right = expr(n.left, counter), expr(n.right, counter)
        if isinstance(n, Intersection):
            return left & right
        if isinstance(n, Union):
            return left | right
        return left & ~right

    keep = F.lit(False)
    for qix, (tree, _) in enumerate(programs):
        keep = keep | ((F.col("qix") == qix) & expr(tree, iter(range(starts[qix], base))))

    limits = local_df(
        store.spark,
        [(qix, int(count)) for qix, (_, count) in enumerate(programs)],
        "qix int, page_count int",
    )
    w = Window.partitionBy("qix").orderBy(F.desc("id"))
    return (
        flags.where(keep)
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(limits), "qix")
        .where(F.col("rn") <= F.col("page_count") + 1)
        .select("qix", "id", "rn")
    )
