"""Data model of the engine: the edge/metadata schemas and the state lifecycle.

Mirrors the reference's fixed primitive type surface
(``src/main/thrift/Flockdb.thrift:37-51``, DDL ``shards/SqlShard.scala:56-79``)
and the 4-state lifecycle with conflict-priority ordinals
(``src/main/scala/com/twitter/flockdb/State.scala:24-36``).

The whole engine is schema-rigid: one StructType for edges, one for metadata.
"""

from __future__ import annotations

import enum

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class State(enum.IntEnum):
    """Edge / vertex lifecycle state.

    Wire ids per ``State.scala:24-36``: Normal=0, Removed=1, Archived=2,
    Negative=3.  Conflict priority (who wins an equal-timestamp merge) is a
    DIFFERENT ordering: Normal(0) < Negative(1) < Archived(2) < Removed(3).
    """

    NORMAL = 0
    REMOVED = 1
    ARCHIVED = 2
    NEGATIVE = 3

    @property
    def priority(self) -> int:
        return STATE_PRIORITY[int(self)]


#: conflict priority by state id — Normal < Negative < Archived < Removed
STATE_PRIORITY = {0: 0, 3: 1, 2: 2, 1: 3}

#: All states; the default read filter of the reference is {Normal}.
ALL_STATES = (0, 1, 2, 3)
DEFAULT_STATES = (State.NORMAL,)


def state_priority(col: Column | str) -> Column:
    """Conflict-priority expression: (4 - state) % 4.

    Closed form of the {0:0, 3:1, 2:2, 1:3} table (``State.scala:24-36``) —
    stays in whole-stage codegen instead of a CASE chain or a python UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.lit(4) - c, F.lit(4))


#: Same expression in ANSI SQL (valid in both Spark SQL and DuckDB).
STATE_PRIORITY_SQL = "((4 - {col}) % 4)"


EDGE_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.IntegerType(), False),
        T.StructField("source_id", T.LongType(), False),
        T.StructField("destination_id", T.LongType(), False),
        # ordered-uuid style sort key: millis << 20 | 20 low bits
        # (UuidGenerator.scala:26-39)
        T.StructField("position", T.LongType(), False),
        # epoch seconds; the last-writer-wins conflict key
        T.StructField("updated_at", T.LongType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("state", T.IntegerType(), False),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.IntegerType(), False),
        T.StructField("source_id", T.LongType(), False),
        # edges whose state equals the vertex state (SqlShard.scala:499)
        T.StructField("count", T.IntegerType(), False),
        T.StructField("state", T.IntegerType(), False),
        T.StructField("updated_at", T.LongType(), False),
    ]
)

EDGE_COLUMNS = [f.name for f in EDGE_SCHEMA.fields]
METADATA_COLUMNS = [f.name for f in METADATA_SCHEMA.fields]


def empty_df(spark, schema: T.StructType) -> "DataFrame":
    """A truly-empty DataFrame that Catalyst can PRUNE.

    ``spark.createDataFrame([], schema)`` is RDD-backed: it plans a
    ``Scan ExistingRDD`` with ``defaultParallelism`` empty partitions, and a
    union against it schedules every one as a real (empty) task — 32 dead
    tasks per job on local[32], a pointless extra stage on a cluster.
    A OneRowRelation filtered to false folds to an empty ``LocalRelation``
    instead, which ``PropagateEmptyRelation`` erases from any union/join it
    touches.  Flat schemas only (every field must be castable from 0).
    """
    cols = [F.lit(0).cast(f.dataType).alias(f.name) for f in schema.fields]
    return spark.sql("select 1").where(F.lit(False)).select(*cols)

def local_df(spark, rows, schema_ddl: str) -> "DataFrame":
    """A driver-side fixture table as a LocalRelation, not an RDD.

    ``spark.createDataFrame(rows)`` parallelizes even a 10-row list into
    ``defaultParallelism`` RDD partitions — every broadcast built from it
    schedules a 32-task stage on local[32] (and a real stage on a cluster)
    just to ship a handful of driver-known constants.  Rendering the rows as
    a ``VALUES`` relation plans a ``LocalTableScan``: zero tasks, and a
    broadcast over it is built driver-side.  Driver-sized inputs only
    (query parameters, op batches, program lists — the same things the
    reference passes in a thrift request).

    Supported cell types: int/float/bool/str/None (flat schemas).
    """
    fields = [f.strip().rsplit(None, 1) for f in schema_ddl.split(",")]

    def cell(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    tuples = ", ".join("(" + ", ".join(cell(v) for v in r) + ")" for r in rows)
    cols = ", ".join(
        f"CAST(c{i} AS {typ}) AS `{name}`" for i, (name, typ) in enumerate(fields)
    )
    names = ", ".join(f"c{i}" for i in range(len(fields)))
    if not rows:
        import pyspark.sql.types as T

        return empty_df(spark, T._parse_datatype_string(schema_ddl))
    return spark.sql(f"SELECT {cols} FROM VALUES {tuples} AS t({names})")


#: position = millis << 20 | low-20-bits  (UuidGenerator.scala:26-39); we use a
#: deterministic key-derived low word instead of random bits so tests can hash.
POSITION_SHIFT = 1 << 20


#: the portable low-word scramble (same multiplicative-congruential family as
#: functions/splits.split_bucket — Knuth's 2654435761 mod 1e9+7), replayable
#: in any SQL engine; production uses xxhash64 (better avalanche)
_UUID_MULT = 2654435761
_UUID_MOD = 1_000_000_007


def ordered_uuid_position(
    millis: Column | str, key: Column | str, hash_mode: str = "xxhash64"
) -> Column:
    """W5 — the reference's ordered-uuid position: time-sortable, collision
    resistant within a millisecond (``UuidGenerator.scala:26-39``).  The
    reference uses 20 random bits; we derive the low word from a key hash so
    results are replayable (Spark's ``monotonically_increasing_id`` is
    partition-dependent — wrong for deterministic tests).

    ``hash_mode="portable"`` (integer keys) swaps xxhash64 for the engine-
    portable multiplicative scramble so a SQL oracle can re-derive every
    position bit-for-bit (the q25 gate).

    The encoding is reversible: ``position div 2^20`` recovers the millis."""
    m = F.col(millis) if isinstance(millis, str) else millis
    k = F.col(key) if isinstance(key, str) else key
    if hash_mode == "portable":
        low = F.pmod(
            F.pmod(k.cast("long"), F.lit(_UUID_MOD)) * F.lit(_UUID_MULT),
            F.lit(_UUID_MOD),
        )
    else:
        low = F.xxhash64(k)
    return m * F.lit(POSITION_SHIFT) + F.pmod(low, F.lit(POSITION_SHIFT))


def ordered_uuid_position_sql(millis_expr: str, key_expr: str) -> str:
    """DuckDB twin of ``ordered_uuid_position(hash_mode="portable")``."""
    low = f"(((CAST({key_expr} AS BIGINT) % {_UUID_MOD}) * {_UUID_MULT}) % {_UUID_MOD})"
    return (
        f"(CAST({millis_expr} AS BIGINT) * {POSITION_SHIFT} + {low} % {POSITION_SHIFT})"
    )


def position_to_millis(position: Column | str) -> Column:
    p = F.col(position) if isinstance(position, str) else position
    # exact: subtract the low word first so the float division is over an
    # exact multiple of 2^20 (≤42 significant bits for any real clock —
    # representable, and a power-of-two divide is lossless).  A bare
    # ``(p / 2^20).cast("long")`` rounds double(p) to ±256 ulp at 2^61 and
    # can carry across the boundary when the low word is within 256 of 2^20.
    return ((p - F.pmod(p, F.lit(POSITION_SHIFT))) / F.lit(POSITION_SHIFT)).cast("long")
