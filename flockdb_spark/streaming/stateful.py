"""Custom stateful streaming operator: the W2 temporal LWW merge
(``shards/SqlShard.scala:432-500``) as a continuously-updating keyed state
machine via ``applyInPandasWithState``.

Where ``ingest.EdgeStreamIngestor`` replays whole tables per micro-batch
(foreachBatch → batch merge), this operator keeps ONE winner per edge key in
Spark-managed state and emits a row only when the winner changes — the shape
you want when the op stream is high-rate and the touched-key set per batch is
small relative to the table.  State is bounded: exactly one
(position, updated_at, state) triple per live (graph, source, destination),
the streaming analogue of the reference's row lock + compare
(``SqlShard.scala:432-468``; tie rule ``Edge.scala:61-68``).

Out-of-order and duplicate delivery need no watermark: the merge is
idempotent and commutative (``doc/blog.md:67-75``), so a stale op simply
loses the comparison and emits nothing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state priority (4 - s) % 4 — Normal(0)<Negative(3)<Archived(2)<Removed(1)
#: by ordinal priority 0<1<2<3 (State.scala:24-36)
_PRIO = {0: 0, 3: 1, 2: 2, 1: 3}

OUTPUT_SCHEMA = (
    "graph_id int, source_id long, destination_id long, "
    "position long, updated_at long, count int, state int"
)
STATE_SCHEMA = "position long, updated_at long, state int"


def _merge_pandas(best: tuple | None, pdf) -> tuple | None:
    """Fold a batch of ops into the current winner; returns the new winner
    tuple (position, updated_at, state) or None if unchanged.

    Matches ``operators.merge.sequenced_merge`` within a batch: ops fold in
    canonical (updated_at, priority, position) order; ``position`` is
    preserved across transitions except Removed/Negative → Normal
    resurrection (``SqlShard.scala:436-446``).  ACROSS batches the stored
    winner guards exactly like the online reference's ``updated_at <= ?``
    predicate — a later-arriving stale op loses (incremental state cannot
    re-serialize the past)."""
    changed = False
    ops = sorted(
        (int(ts), _PRIO[int(st)], int(pos), int(st))
        for pos, ts, st in zip(
            pdf["position"].astype("int64"),
            pdf["updated_at"].astype("int64"),
            pdf["op_state"].astype("int64"),
        )
    )
    for ts, prio, pos, st in ops:
        if best is None:
            best = (pos, ts, st)
            changed = True
            continue
        cur = (best[1], _PRIO[best[2]], best[0])
        if (ts, prio, pos) > cur:
            new_pos = pos if (best[2] in (1, 3) and st == 0) else best[0]
            best = (new_pos, ts, st)
            changed = True
    return best if changed else None


def stateful_edge_lww(ops: DataFrame) -> DataFrame:
    """ops (streaming): (op_state, graph_id, source_id, destination_id NOT
    NULL, position, updated_at) → update-mode stream of current edge winners.

    Each emitted row is the edge's present LWW-resolved value; downstream
    sinks (Delta MERGE, memory table keyed on the edge) hold the live table.
    """

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        best = tuple(state.get) if state.exists else None
        new = None
        for pdf in pdfs:
            folded = _merge_pandas(new or best, pdf)
            if folded is not None:
                new = folded
        if new is not None:
            state.update(new)
            g, s, d = key
            yield pd.DataFrame(
                {
                    "graph_id": [int(g)],
                    "source_id": [int(s)],
                    "destination_id": [int(d)],
                    "position": [new[0]],
                    "updated_at": [new[1]],
                    "count": [0],
                    "state": [new[2]],
                }
            )

    return (
        ops.where(F.col("destination_id").isNotNull())
        .groupBy("graph_id", "source_id", "destination_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
