"""As-of (point-in-time) join — the canonical "operator Spark lacks"
(task brief example), expressed as a composition of existing DataFrame ops
rather than a join at all.

For each left row, find the single right row with the same key and the
greatest right_time ≤ (or <, strict) left_time.  The naive formulation is a
range join (quadratic per key); the scalable one is ONE shuffle:

    union both sides tagged → sort within key by (time, side) →
    last(right_payload, ignorenulls) carry-forward window → keep left rows.

Every engine's native ASOF (DuckDB, QuestDB, kdb) is this sweep internally;
on Spark the window does it with map-side sort + a single hash exchange on
the key — no join, no per-key quadratic blow-up, skew bounded by the
biggest single key's row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload: list[str],
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join.  ``payload``: right columns to attach (returned as
    ``{prefix}{col}``, NULL when no right row qualifies).

    ``strict=True`` matches right_time < left_time; otherwise ≤.  Right rows
    must be unique per (key, right_time) for a deterministic result — callers
    aggregate duplicates away first (same contract as DuckDB ASOF).
    """
    # at equal times: strict ⇒ the left row must NOT see the right row, so
    # left sorts first; non-strict ⇒ right first
    l_side, r_side = (0, 1) if strict else (1, 0)
    l_other = [f for f in left.schema.fields if f.name not in on]
    payload_struct = F.struct(*payload)

    r_tagged = right.select(
        *on,
        F.col(right_time).cast("long").alias("_t"),
        F.lit(r_side).alias("_side"),
        payload_struct.alias("_payload"),
        F.lit(False).alias("_is_left"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in l_other],
    )
    l_tagged = left.select(
        *on,
        F.col(left_time).cast("long").alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(dict(r_tagged.dtypes)["_payload"]).alias("_payload"),
        F.lit(True).alias("_is_left"),
        *[F.col(f.name) for f in l_other],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    return swept.where(F.col("_is_left")).select(
        *on,
        *[F.col(f.name) for f in l_other],
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in payload],
    )
