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
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.merge import apply_oplog
from ..schema import EDGE_COLUMNS, EDGE_SCHEMA, METADATA_SCHEMA, empty_df

OPS_SCHEMA = T.StructType(
    [
        T.StructField("op_state", T.IntegerType()),
        T.StructField("graph_id", T.IntegerType()),
        T.StructField("source_id", T.LongType()),
        T.StructField("destination_id", T.LongType(), nullable=True),
        T.StructField("position", T.LongType()),
        T.StructField("updated_at", T.LongType()),
        # W12 priority class (Priority.scala:19-23); absent/null = Medium
        T.StructField("priority", T.IntegerType(), nullable=True),
    ]
)

#: the reference's three write-queue classes (``Priority.scala:19-23``;
#: ``config/production.scala:98-102`` sizes one Kestrel queue per class)
PRIORITY_HIGH, PRIORITY_MEDIUM, PRIORITY_LOW = 3, 2, 1


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
    batch path and commits ONLY the hash buckets the batch touched.

    The store is a versioned bucket layout under a single commit log — a
    minimal Delta-style transaction log, which is what gives the ATOMIC
    cross-table commit the reference gets from its journaled write queue
    (``doc/blog.md:110-119``: a queued job either applies or stays queued;
    edges and counts never diverge):

    - ``{table_dir}/data/v{N}/{edges,metadata}/bucket=K/`` — immutable data
      written by commit N (bucket = ``pmod(xxhash64(source_id), n_buckets)``);
    - ``{table_dir}/_commits/{N:08d}.json`` — ONE manifest per commit
      mapping every live bucket of BOTH tables to the version that last
      wrote it.  Readers resolve the newest manifest; the commit point is a
      single atomic ``os.replace`` of that file.

    Per batch:

    1. the touched bucket set is computed from the ops (for backward mass
       ops, from a column-pruned scan for edges INTO the target vertices —
       their rows live in their *sources'* buckets);
    2. only those buckets are read (the manifest prunes paths), merged with
       the batch via the same :func:`apply_oplog` as the batch path;
    3. both tables' merged buckets are staged into the NEW version dir —
       existing data is never overwritten — and the manifest rename commits
       them together.  A crash anywhere before the rename leaves readers on
       the previous manifest: all-old or all-new, never edges@N with
       metadata@N−1.

    Write cost scales with the batch, not the table; at cluster scale the
    same layout is a Delta/Iceberg table and the manifest rename is its
    transactional MERGE commit."""

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        checkpoint_dir: str,
        n_buckets: int = 64,
        error_dir: str | None = None,
    ):
        self.spark = spark
        self.table_dir = table_dir
        self.error_dir = error_dir
        self.checkpoint_dir = checkpoint_dir
        self.n_buckets = n_buckets

    def _bucket(self, col: str) -> F.Column:
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.n_buckets)).cast("int")

    # -- commit log ---------------------------------------------------------

    def _commits_dir(self) -> str:
        return f"{self.table_dir}/_commits"

    def _version_dir(self, version: int, name: str) -> str:
        return f"{self.table_dir}/data/v{version}/{name}"

    def latest_commit(self) -> tuple[int, dict]:
        """(version, {"edges": {bucket: version}, "metadata": {...}}) of the
        newest complete manifest; (0, empty) before the first commit."""
        import glob
        import json

        files = sorted(glob.glob(f"{self._commits_dir()}/*.json"))
        if not files:
            return 0, {"edges": {}, "metadata": {}}
        with open(files[-1]) as f:
            m = json.load(f)
        return m["version"], m["tables"]

    def _commit(self, version: int, tables: dict, batch_id: int) -> None:
        """THE commit point: stage the manifest, then one atomic rename.
        Everything before this is invisible to readers; everything after is
        fully visible for both tables at once."""
        import json
        import os

        os.makedirs(self._commits_dir(), exist_ok=True)
        tmp = f"{self._commits_dir()}/.tmp-{version}.json"
        with open(tmp, "w") as f:
            json.dump({"version": version, "batch_id": batch_id, "tables": tables}, f)
        os.replace(tmp, f"{self._commits_dir()}/{version:08d}.json")

    def bucket_paths(self, name: str, tables: dict | None = None) -> dict[int, str]:
        """bucket → committed data directory, per the (latest) manifest."""
        if tables is None:
            _, tables = self.latest_commit()
        return {
            int(b): f"{self._version_dir(v, name)}/bucket={b}"
            for b, v in tables[name].items()
        }

    def _read_table(self, name: str, tables: dict | None = None) -> DataFrame:
        paths = self.bucket_paths(name, tables)
        schema = EDGE_SCHEMA if name == "edges" else METADATA_SCHEMA
        if not paths:
            return empty_df(self.spark, schema).withColumn(
                "bucket", self._bucket("source_id")
            )
        by_version: dict[str, list[str]] = {}
        for p in paths.values():
            by_version.setdefault(p.rsplit("/bucket=", 1)[0], []).append(p)
        parts = [
            self.spark.read.option("basePath", base).parquet(*ps)
            for base, ps in sorted(by_version.items())
        ]
        df = parts[0]
        for other in parts[1:]:
            df = df.unionByName(other)
        return df

    def versions(self) -> list[int]:
        """Committed versions still present in the log, ascending — the
        time-travel axis.  Every micro-batch is one version, so a training
        run can pin 'the corpus as of version N' and stay reproducible
        while ingestion continues."""
        import glob
        import os

        return sorted(
            int(os.path.basename(p).split(".")[0])
            for p in glob.glob(f"{self._commits_dir()}/*.json")
        )

    def commit_at(self, version: int) -> tuple[int, dict]:
        """(version, tables) manifest of a SPECIFIC committed version —
        the reader half of time travel.  Raises if that manifest is gone
        (never committed, or aged out by ``vacuum(keep_versions=...)``)."""
        import json

        try:
            with open(f"{self._commits_dir()}/{version:08d}.json") as f:
                m = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"version {version} is not in the commit log "
                f"(available: {self.versions()})"
            ) from None
        return m["version"], m["tables"]

    def edges(self, version: int | None = None) -> DataFrame:
        """The committed edge table — the latest snapshot, or (time travel)
        the snapshot exactly as of ``version``.  Versioned reads resolve the
        historical manifest's bucket→version map, so they see all-old data:
        no mixing with later commits, the same atomicity contract as the
        live read."""
        tables = None if version is None else self.commit_at(version)[1]
        return self._read_table("edges", tables).drop("bucket")

    def metadata(self, version: int | None = None) -> DataFrame:
        tables = None if version is None else self.commit_at(version)[1]
        return self._read_table("metadata", tables).drop("bucket")

    def _current(self) -> tuple[DataFrame, DataFrame]:
        _, tables = self.latest_commit()
        return self._read_table("edges", tables), self._read_table("metadata", tables)

    def _apply_batch(self, ops: DataFrame, batch_id: int) -> None:
        # the micro-batch is read 2-3×; materialize once (batch-sized)
        if "priority" in ops.columns:
            ops = ops.drop("priority")  # routing concern, not merge input
        ops = ops.localCheckpoint(eager=True)
        if self.error_dir is not None:
            ops = self._quarantine(ops, batch_id)
        edges, md = self._current()

        # touched buckets from the ops' own vertices: every single op's edge
        # row, every forward mass expansion, and every metadata update lives
        # in bucket(source_id)
        vbuckets = {
            r["b"]
            for r in ops.select(self._bucket("source_id").alias("b")).distinct().collect()
        }
        ebuckets = set(vbuckets)
        # a backward mass op rewrites edges INTO the vertex — rows stored in
        # their sources' buckets; one column-pruned scan finds those buckets
        if "is_forward" in ops.columns:
            bwd = ops.where(
                F.col("destination_id").isNull() & ~F.col("is_forward")
            ).select(
                F.col("graph_id").alias("_g"), F.col("source_id").alias("_v")
            )
            if bwd.limit(1).count():
                ebuckets |= {
                    r["b"]
                    for r in edges.join(
                        F.broadcast(bwd),
                        on=(F.col("graph_id") == F.col("_g"))
                        & (F.col("destination_id") == F.col("_v")),
                        how="inner",
                    )
                    .select(F.col("bucket").alias("b"))
                    .distinct()
                    .collect()
                }

        sub_e = edges.where(F.col("bucket").isin(sorted(ebuckets))).drop("bucket")
        sub_m = md.where(F.col("bucket").isin(sorted(vbuckets))).drop("bucket")
        new_edges, new_md = apply_oplog(sub_e, sub_m, ops)

        # stage both tables into the NEW version dir (never touching committed
        # data), then commit both with one manifest rename.  The merged subset
        # is O(touched buckets), not O(table); the localCheckpoint keeps the
        # metadata write from re-running the merge lineage.
        staged_e = (
            new_edges.select(*EDGE_COLUMNS)
            .withColumn("bucket", self._bucket("source_id"))
            .localCheckpoint(eager=True)
        )
        staged_m = (
            new_md.withColumn("bucket", self._bucket("source_id"))
            .localCheckpoint(eager=True)
        )
        version, tables = self.latest_commit()
        new_v = version + 1
        touched = {"edges": ebuckets, "metadata": vbuckets}
        new_tables = self._stage(
            new_v, {"edges": staged_e, "metadata": staged_m}, touched, tables
        )
        self._commit(new_v, new_tables, batch_id)

    def _stage(
        self, new_v: int, staged: dict[str, DataFrame], touched: dict, tables: dict
    ) -> dict:
        """Write each table's merged buckets under version ``new_v`` (mode
        overwrite clobbers leftovers of a crashed attempt at the same
        version — they were never committed) and return the next manifest:
        touched-and-now-empty buckets drop out, written buckets point at
        ``new_v``, untouched buckets keep their version."""
        import glob

        new_tables: dict[str, dict] = {}
        for name, df in staged.items():
            out = self._version_dir(new_v, name)
            df.write.mode("overwrite").partitionBy("bucket").parquet(out)
            written = {
                int(d.rsplit("=", 1)[1]) for d in glob.glob(f"{out}/bucket=*")
            }
            mapping = dict(tables[name])
            for b in touched[name]:
                mapping.pop(str(b), None)
            for b in written:
                mapping[str(b)] = new_v
            new_tables[name] = mapping
        return new_tables

    # -- error-queue parity (ErrorHandlingJobQueue: a failed job is shunted
    # to an error journal and periodically re-injected, doc/blog.md:110-119).
    # A malformed op must QUARANTINE — not sink the micro-batch (the
    # whole-batch retry Spark already does would fail forever on a poison
    # record).  Enabled by passing error_dir.


    def _quarantine(self, ops: DataFrame, batch_id: int) -> DataFrame:
        flagged = ops.withColumn("_err", op_error_reason())
        bad = flagged.where(F.col("_err").isNotNull())
        if bad.limit(1).count():
            # foreachBatch is at-least-once: a replayed micro-batch must not
            # re-append the same poison records.  Keying the write on batch_id
            # with overwrite makes the journal idempotent per batch — the
            # replay rewrites its own subdirectory instead of duplicating it.
            (
                bad.select(
                    "*",
                    F.lit(batch_id).cast("long").alias("batch_id"),
                )
                .withColumnRenamed("_err", "error_reason")
                .write.mode("overwrite")
                .json(f"{self.error_dir}/batch-{batch_id}")
            )
        return flagged.where(F.col("_err").isNull()).drop("_err")

    def errors(self) -> DataFrame:
        """The current error journal (empty frame when nothing ever failed).
        Schema is PINNED — inference would widen ints to long and poison the
        edge table's parquet types on re-injection."""
        schema = T.StructType(
            [
                *OPS_SCHEMA.fields,
                T.StructField("error_reason", T.StringType()),
                T.StructField("batch_id", T.LongType()),
            ]
        )
        try:
            df = (
                self.spark.read.schema(schema)
                .option("recursiveFileLookup", "true")  # batch-N subdirs
                .json(self.error_dir)
            )
            df.limit(1).count()  # surface missing-path errors eagerly
            return df
        except Exception:  # no errors written yet
            return empty_df(self.spark, schema)

    def retry_errors(self, fix=None) -> int:
        """Re-inject journaled error ops (the reference's periodic error-queue
        flush).  ``fix``: optional DataFrame→DataFrame repair hook applied
        first (e.g. clamp states, fill timestamps).  Ops that now validate
        are applied through the normal merge; the journal is rewritten with
        only the still-invalid remainder.  Returns the number re-applied."""
        errs = self.errors()
        if not errs.limit(1).count():
            return 0
        candidates = errs.select(*[f.name for f in OPS_SCHEMA.fields])
        if fix is not None:
            candidates = fix(candidates)
        flagged = candidates.withColumn("_err", op_error_reason()).localCheckpoint(
            eager=True
        )
        good = flagged.where(F.col("_err").isNull()).drop("_err")
        n_good = good.count()
        if n_good:
            saved, self.error_dir = self.error_dir, None  # already journaled
            try:
                self._apply_batch(good, batch_id=-1)
            finally:
                self.error_dir = saved
        still_bad = (
            flagged.where(F.col("_err").isNotNull())
            .withColumnRenamed("_err", "error_reason")
            .withColumn("batch_id", F.lit(-1).cast("long"))
            .localCheckpoint(eager=True)
        )
        still_bad.write.mode("overwrite").json(self.error_dir)
        return n_good

    def compact(self, max_files_per_bucket: int = 1) -> int:
        """Small-file compaction — the OPTIMIZE pass every streaming table
        needs: a multi-task commit (or bulk load) can leave several files in
        one bucket, and scan cost degrades as the file count grows (per-file
        open cost + footer reads dominate tiny files).  Rewrites only buckets
        holding more than ``max_files_per_bucket`` files, coalesced to one
        sorted file each, into a fresh version committed atomically for both
        tables; untouched buckets keep their committed files byte-identical —
        the same O(touched) contract as the batch commit.  Returns the number
        of buckets compacted.  (Delta/Iceberg ship this as OPTIMIZE /
        rewrite_data_files; same loop, same transactional commit.)"""
        import glob as _glob

        version, tables = self.latest_commit()
        new_v = version + 1
        new_tables = {n: dict(m) for n, m in tables.items()}
        compacted = 0
        for name, sort_cols in (
            ("edges", ["source_id", "position"]),
            ("metadata", ["source_id"]),
        ):
            fat = [
                b
                for b, d in self.bucket_paths(name, tables).items()
                if len(_glob.glob(f"{d}/*.parquet")) > max_files_per_bucket
            ]
            if not fat:
                continue
            out = self._version_dir(new_v, name)
            (
                self._read_table(name, tables)
                .where(F.col("bucket").isin(fat))
                .repartition("bucket")
                .sortWithinPartitions("bucket", *sort_cols)
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(out)
            )
            for b in _glob.glob(f"{out}/bucket=*"):
                new_tables[name][b.rsplit("=", 1)[1]] = new_v
            compacted += len(fat)
        if compacted:
            self._commit(new_v, new_tables, batch_id=-2)
        return compacted

    def vacuum(self, keep_versions: int = 0) -> int:
        """Remove data version directories not referenced by the retained
        manifests (Delta's VACUUM).  ``keep_versions`` is the time-travel
        retention: 0 keeps only the latest snapshot; K keeps the last K+1
        manifests readable via ``edges(version=...)``.  Manifests older than
        the retention window are pruned with their data, so a stale
        ``commit_at`` raises (version listed as gone) instead of resolving
        dangling paths.  Returns the number of data versions removed."""
        import glob as _glob
        import os as _os
        import shutil as _shutil

        versions = self.versions()
        retained = versions[-(keep_versions + 1):] if versions else []
        live: set[int] = set()
        for v in retained:
            _, tables = self.commit_at(v)
            live |= {int(x) for m in tables.values() for x in m.values()}
        for v in versions:
            if v not in retained:
                _os.remove(f"{self._commits_dir()}/{v:08d}.json")
        removed = 0
        for d in _glob.glob(f"{self.table_dir}/data/v*"):
            if int(_os.path.basename(d)[1:]) not in live:
                _shutil.rmtree(d)
                removed += 1
        return removed

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

    def drain_prioritized(
        self, ops_dir: str, max_files_per_trigger: int | None = None
    ) -> None:
        """W12 priority classes: the reference journals every write into one
        of three Kestrel queues — High, Medium, Low (``Priority.scala:19-23``;
        ``config/production.scala:98-102`` provisions a queue per class) —
        and its schedulers drain High before the others, so a backlog of
        bulk Low writes never delays user-facing High ones.

        Spark-first mapping: each class is a FILTERED VIEW of the same
        journal with its OWN streaming checkpoint (the three-queues shape
        without three physical journals), drained to exhaustion in priority
        order.  Every High op is therefore merged and COMMITTED (visible in
        an earlier manifest version) before the first Medium op is read —
        observable backlog behavior identical to the reference's, and each
        class's checkpoint makes its drain independently resumable.  Ops
        with no ``priority`` column value default to Medium (the reference's
        default write class)."""
        for pr in (PRIORITY_HIGH, PRIORITY_MEDIUM, PRIORITY_LOW):
            cls = stream_writes(self.spark, ops_dir, max_files_per_trigger).where(
                F.coalesce(F.col("priority"), F.lit(PRIORITY_MEDIUM)) == pr
            )
            q = (
                cls.writeStream.foreachBatch(self._apply_batch)
                .option("checkpointLocation", f"{self.checkpoint_dir}/priority={pr}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()


#: per-op validity — the checks the reference's job parser enforces before a
#: Single/Multi job is enqueued (jobs/single/Single.scala:66-91 rejects
#: malformed payloads into the error queue rather than failing the worker)
def op_error_reason() -> F.Column:
    """NULL for a valid op, else a diagnostic reason string."""
    return (
        F.when(F.col("source_id").isNull() | F.col("graph_id").isNull(), "null_vertex")
        .when(~F.col("op_state").isin(0, 1, 2, 3), "bad_state")
        .when(F.col("updated_at").isNull(), "no_timestamp")
        .otherwise(F.lit(None).cast("string"))
    )


