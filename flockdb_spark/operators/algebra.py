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
            ids_df = store.spark.createDataFrame(
                [(int(i),) for i in self.in_ids], f"{self.term.id_col} long"
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
        return self.left.ids(store).unionByName(self.right.ids(store)).distinct()


@dataclass(frozen=True)
class Difference(QueryNode):
    """R13 (``queries/DifferenceQuery.scala``) — anti-join A − B."""

    left: QueryNode
    right: QueryNode

    def children(self) -> tuple[QueryNode, ...]:
        return (self.left, self.right)

    def ids(self, store: EdgeStore) -> DataFrame:
        return self.left.ids(store).join(self.right.ids(store), on="id", how="left_anti")
