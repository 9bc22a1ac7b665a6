"""W11 — copy/repair anti-entropy between two diverged edge tables.

The reference runs a cursor-chunked k-way merge across replica shards in
(source, destination) order, writing the newest version of each edge to the
stale side (``jobs/Copy.scala:65-129``; newest = ``Edge.similar``/``updatedAt``,
``Edge.scala:53-59``).  In Spark the whole algorithm is the W2 rule applied
across tables: union + greatest-by — one shuffle, no cursors, no chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .merge import temporal_merge


def reconcile(a: DataFrame, b: DataFrame) -> DataFrame:
    """Repaired table both replicas converge to: per (graph, source, dest)
    keep the greatest (updated_at, state_priority, position) row."""
    return temporal_merge(a, b)


def diff_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """Rows of the repaired table that differ from (or are missing in) ``b`` —
    what the copy job would actually ship to the stale replica."""
    repaired = reconcile(a, b)
    return repaired.exceptAll(b)
