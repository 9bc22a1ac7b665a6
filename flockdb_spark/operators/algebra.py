"""The compound query algebra: wildcard select, where-in, intersection, union,
difference — arbitrary binary trees (``queries/Query.scala:40-72``).

The reference evaluates these PULL-based and paged: internal nodes loop,
fetching pages from the smaller child and probing the larger with
``selectWhereIn`` semi-joins (``queries/IntersectionQuery.scala:23-76``).
Spark-first that whole machinery collapses into a Catalyst plan: each node is a
DataFrame transformation, the optimizer picks hash-semi/anti joins, broadcasts
small sides, and AQE re-plans at runtime (which subsumes the reference's
"drive from the smaller side" rule, ``queries/Query.scala:51-66``).

Canonical result of any node: a one-column DataFrame ``id`` — the neighbor ids
from the term's point of view, the same id-set the reference's set ops return.
``Simple`` nodes additionally expose the full edge rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeStore
from ..schema import local_df

#: IN-lists up to this size stay inline literals (the reference routes ≤50-id
#: lists to its low-latency query class, ``shards/SqlShard.scala:36-45,323-329``);
#: bigger lists become a broadcast semi-join.
INLINE_IN_LIST_MAX = 64


@dataclass(frozen=True)
class Term:
    """A leaf lookup: vertex + graph + direction + state filter.

    ``forward=False`` is the reference's negated-graph backward table
    (``ForwardingManager.scala:35-37``) — here just a filter on the other key.
    """

    graph_id: int
    source_id: int
    forward: bool = True
    states: tuple[int, ...] = (0,)

    @property
    def id_col(self) -> str:
        return "destination_id" if self.forward else "source_id"

    @property
    def vertex_col(self) -> str:
        return "source_id" if self.forward else "destination_id"

    def edges(self, store: EdgeStore) -> DataFrame:
        return store.graph(self.graph_id).where(
            (F.col(self.vertex_col) == self.source_id)
            & F.col("state").isin(list(self.states))
        )


class QueryNode:
    """Base: compiles to a DataFrame of ids."""

    def ids(self, store: EdgeStore) -> DataFrame:
        raise NotImplementedError

    def children(self) -> tuple["QueryNode", ...]:
        return ()

    def depth(self) -> int:
        kids = self.children()
        return 1 + max((k.depth() for k in kids), default=0)


@dataclass(frozen=True)
class Simple(QueryNode):
    """Wildcard adjacency scan (R5, ``queries/SimpleQuery.scala:23-47``)."""

    term: Term

    def ids(self, store: EdgeStore) -> DataFrame:
        return self.term.edges(store).select(F.col(self.term.id_col).alias("id"))

    def edges(self, store: EdgeStore) -> DataFrame:
        return self.term.edges(store)


@dataclass(frozen=True)
class WhereIn(QueryNode):
    """IN-list semi-join (R9, ``queries/WhereInQuery.scala:24-47``)."""

    term: Term
    in_ids: tuple[int, ...]

    def ids(self, store: EdgeStore) -> DataFrame:
        base = self.term.edges(store)
        idc = F.col(self.term.id_col)
        if len(self.in_ids) <= INLINE_IN_LIST_MAX:
            # small list: stays a pushed-down IN filter at the scan
            out = base.where(idc.isin(list(self.in_ids)))
        else:
            # large list: broadcast semi-join (SqlShard's >50-id class)
            ids_df = local_df(
                store.spark, [(int(i),) for i in self.in_ids], f"{self.term.id_col} long"
            )
            out = base.join(F.broadcast(ids_df), on=self.term.id_col, how="left_semi")
        return out.select(idc.alias("id"))

    def edges(self, store: EdgeStore) -> DataFrame:
        """intersectEdges (R10, ``shards/SqlShard.scala:337-349``)."""
        base = self.term.edges(store)
        return base.where(F.col(self.term.id_col).isin(list(self.in_ids)))


@dataclass(frozen=True)
class Intersection(QueryNode):
    """R11 — the reference pages the smaller side and semi-joins the larger
    (``IntersectionQuery.scala:42-54``); Catalyst's hash semi-join + AQE does
    the side selection and short-circuits empty relations."""

    left: QueryNode
    right: QueryNode

    def children(self) -> tuple[QueryNode, ...]:
        return (self.left, self.right)

    def ids(self, store: EdgeStore) -> DataFrame:
        flat = flat_ids(self, store)
        if flat is not None:
            return flat
        # children are id-sets ((src,dst) unique per graph), so the semi-join
        # output is already distinct — no extra shuffle needed
        return self.left.ids(store).join(self.right.ids(store), on="id", how="left_semi")


@dataclass(frozen=True)
class Union(QueryNode):
    """R12 (``queries/UnionQuery.scala:22-49``) — SQL UNION (dedup)."""

    left: QueryNode
    right: QueryNode

    def children(self) -> tuple[QueryNode, ...]:
        return (self.left, self.right)

    def ids(self, store: EdgeStore) -> DataFrame:
        flat = flat_ids(self, store)
        if flat is not None:
            return flat
        return self.left.ids(store).unionByName(self.right.ids(store)).distinct()


@dataclass(frozen=True)
class Difference(QueryNode):
    """R13 (``queries/DifferenceQuery.scala``) — anti-join A − B."""

    left: QueryNode
    right: QueryNode

    def children(self) -> tuple[QueryNode, ...]:
        return (self.left, self.right)

    def ids(self, store: EdgeStore) -> DataFrame:
        flat = flat_ids(self, store)
        if flat is not None:
            return flat
        return self.left.ids(store).join(self.right.ids(store), on="id", how="left_anti")


# ---------------------------------------------------------------------------
# Flat compound evaluation — arbitrary set-op trees as ONE scan + ONE shuffle
# ---------------------------------------------------------------------------

def _flat_leaves(node: QueryNode) -> list | None:
    """Leaves of a flattenable subtree in leftmost-depth-first order, or None.

    Flattenable: every leaf is Simple or an inline-sized WhereIn (a broadcast
    IN-list would bloat the tagging expression — those trees keep the join
    composition)."""
    if isinstance(node, Simple):
        return [node]
    if isinstance(node, WhereIn):
        return [node] if len(node.in_ids) <= INLINE_IN_LIST_MAX else None
    if isinstance(node, (Intersection, Union, Difference)):
        left = _flat_leaves(node.left)
        right = _flat_leaves(node.right)
        return None if left is None or right is None else left + right
    return None


def flat_ids(node: QueryNode, store: EdgeStore) -> DataFrame | None:
    """Evaluate a whole compound tree in one pass, or None if not flattenable.

    The reference evaluates compound trees by recursive paged set-ops — N
    leaves mean N index lookups and up to N-1 merge loops
    (``queries/IntersectionQuery.scala:23-76``).  The join composition below
    mirrors that shape (one scan branch + one shuffle per node); this
    evaluator instead tags each edge row with every leaf it satisfies (an
    explode over per-leaf membership structs — pure map side), aggregates
    per-id membership FLAGS in one shuffle, and applies the tree as a boolean
    expression over the flags:

        A ∩ B → fA & fB      A ∪ B → fA | fB      A − B → fA & ~fB

    One table scan, one broadcast-free shuffle, any tree depth, any mix of
    directions/graphs/state filters.  At 100 TB this is the difference
    between 2·depth table passes and one.  q13's two 3-leaf trees drop from
    19 exchanges to 2.
    """
    leaves = _flat_leaves(node)
    if leaves is None or not isinstance(node, (Intersection, Union, Difference)):
        return None
    preds, entries = [], []
    for i, leaf in enumerate(leaves):
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
                p, F.struct(F.lit(i).alias("leaf"), F.col(t.id_col).alias("id"))
            )
        )
    coarse = preds[0]
    for p in preds[1:]:
        coarse = coarse | p
    tagged = (
        store.edges.where(coarse)
        .select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select(F.col("e.leaf").alias("leaf"), F.col("e.id").alias("id"))
    )
    flags = tagged.groupBy("id").agg(
        *[
            F.max(F.when(F.col("leaf") == i, 1).otherwise(0)).alias(f"f{i}")
            for i in range(len(leaves))
        ]
    )
    # rebuild the boolean over flags walking the SAME leftmost-first order
    counter = iter(range(len(leaves)))

    def expr(n: QueryNode):
        if isinstance(n, (Simple, WhereIn)):
            return F.col(f"f{next(counter)}") == 1
        left, right = expr(n.left), expr(n.right)
        if isinstance(n, Intersection):
            return left & right
        if isinstance(n, Union):
            return left | right
        return left & ~right

    return flags.where(expr(node)).select("id")
