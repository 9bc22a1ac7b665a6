"""Document-corpus sources and sinks beyond the driver's parquet.

Real training-data feeds arrive as JSONL (one document object per line) and
leave as a partitioned, size-targeted parquet corpus.  Both directions stay
on Spark's native readers/writers so Catalyst keeps pushdown and the
scheduler parallelizes per file split:

- **JSONL source**: ``spark.read.schema(...).json`` — an explicit schema
  skips the whole-file inference pass (one full read saved; at 100 TB that
  pass IS the job) and pins column types against drifting producers.
  Corrupt lines land in ``_corrupt_record`` instead of failing the batch
  (PERMISSIVE), so one bad producer can't sink a corpus pass.
- **JSONL sink**: line-delimited text, one file per partition — the
  interchange format for downstream tokenizer/training jobs.
- **Curated parquet sink**: partitioned by a low-cardinality column (lang /
  source / split), sorted within files by doc_id so parquet min/max
  row-group stats support id-range skipping — the documents twin of
  ``EdgeStore.write_optimized`` (SqlShard.scala:64-67 plays this role for
  the reference's edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Load a JSONL document corpus with a pinned schema.

    ``keep_corrupt`` adds the PERMISSIVE ``_corrupt_record`` column so
    malformed lines are quarantined (filter it, write them to a dead-letter
    path) rather than aborting; pass False for strict FAILFAST ingestion.
    """
    if keep_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
        )
        return (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_documents_jsonl(docs: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a corpus as JSONL.  ``n_files`` repartitions first — size output
    files for the consumer (a tokenizer shard wants ~100-500 MB each), not
    for whatever partitioning the upstream job happened to end with."""
    out = docs.repartition(n_files) if n_files else docs
    out.write.mode("overwrite").json(path)


def write_curated(
    docs: DataFrame,
    path: str,
    partition_by: str = "lang",
    sort_col: str = "doc_id",
) -> None:
    """Persist the curated corpus partitioned + sorted for downstream scans.

    Partitioning by a low-cardinality column gives directory-level pruning
    (a per-language training mix reads only its partitions); the
    within-file sort gives row-group skipping on ``sort_col`` ranges.
    ``repartition(partition_by)`` puts each partition's rows in one task so
    the writer emits one file per partition value instead of
    tasks × partitions fragments.
    """
    (
        docs.repartition(F.col(partition_by))
        .sortWithinPartitions(partition_by, sort_col)
        .write.mode("overwrite")
        .partitionBy(partition_by)
        .parquet(path)
    )


def read_curated(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_documents_csv(docs: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a corpus as CSV with full-fidelity quoting: fields containing
    the delimiter, quotes, or newlines are quoted with embedded quotes
    doubled (RFC 4180), so free text survives the round trip.

    NULL vs empty string is kept distinguishable — the one thing quoteAll
    cannot do (it renders both as ``""``): an empty string is written as a
    QUOTED ``""`` (``emptyValue``) while NULL stays a bare empty field, and
    :func:`read_documents_csv` maps only the bare field back to NULL.
    Whitespace trimming is disabled so padded text survives unquoted.
    """
    out = docs.repartition(n_files) if n_files else docs
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Load a CSV document corpus with a pinned schema.

    ``multiLine`` lets quoted fields span physical lines (document text
    contains newlines); ``escape='"'`` reads RFC 4180 doubled quotes.  The
    explicit schema skips inference (a full extra pass at corpus scale) —
    same rationale as :func:`read_documents_jsonl`.  Note ``multiLine``
    makes a single file non-splittable (quote state can't be resumed
    mid-file), so corpus-scale CSV should arrive as MANY files — the
    parallelism is across files, not within them.

    ``nullValue`` is pinned to NUL (a byte that never appears in sane
    text), so no document TEXT can be swallowed into NULL — only the
    writer's bare empty field parses as NULL, and the quoted ``""`` the
    writer emits for empty strings comes back as an empty string.
    """
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .option("emptyValue", "")
        .option("nullValue", "\x00")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_documents_orc(docs: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a corpus as ORC with zlib compression — the columnar
    interchange format the Hive/Trino side of a lakehouse hands over when
    parquet isn't the house standard.  Spark's ORC writer records min/max
    stripe statistics, so the reader below gets predicate pushdown for
    free, same as parquet."""
    out = docs.repartition(n_files) if n_files else docs
    out.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_documents_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Load an ORC document corpus with a pinned schema (no inference pass;
    ORC embeds its schema but pinning keeps ingestion contracts explicit —
    a column-type drift fails loudly here instead of downstream).  ORC
    stripes are splittable, so unlike multiLine CSV a single large file
    still parallelizes."""
    return spark.read.schema(schema).orc(path)
