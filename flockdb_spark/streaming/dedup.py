"""Streaming deduplication of the write-op journal.

The reference's queue is at-least-once: jobs are re-enqueued on error and
re-delivered after crashes, and the whole design leans on W2's idempotence to
absorb that (doc/blog.md:67-75, jobs/single/Single.scala:124-135 memoizes
successes for exactly this reason).  The merge therefore never NEEDS dedup —
but at 20k writes/s a retry storm makes every duplicate a wasted shuffle row
through the merge.  This operator drops redelivered ops before they reach
``foreachBatch``, with state bounded by an event-time watermark:
``dropDuplicatesWithinWatermark`` keeps one state row per op key and evicts
it once the watermark passes, so memory is O(ops within the watermark
horizon), not O(all ops ever) — the property that matters on an unbounded
100 TB/day stream.

Division of labor (same as streaming/windows.py): a duplicate arriving
LATER than the watermark horizon is not caught here — it flows on to the
merge, which folds it away idempotently.  Dedup is an optimization, the
merge is the correctness backstop; the watermark can be tuned to the
observed redelivery lag without any correctness stake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the full op identity — two ops equal on all of these are the same logical
#: write, so dropping one is semantics-preserving even without the merge
OP_KEY = ["graph_id", "source_id", "destination_id", "op_state", "position", "updated_at"]


def dedup_ops_within_watermark(ops: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop redelivered write ops within the event-time watermark horizon.

    Input: a streaming ops DataFrame (OPS_SCHEMA).  Output: the same stream
    minus duplicates whose key state is still live.  Chain in front of
    ``EdgeStreamIngestor``'s merge.
    """
    return (
        ops.withColumn("event_time", F.timestamp_seconds(F.col("updated_at")))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(OP_KEY)
        .drop("event_time")
    )
