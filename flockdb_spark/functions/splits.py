"""Deterministic train/validation/test splitting — the last step of every
training-data pipeline: every row must land in exactly one split, the
assignment must be stable across runs/engines/cluster sizes, and joining any
derived table back must never straddle splits.

The bucket hash is a multiplicative-congruential scramble of the id in pure
64-bit integer arithmetic (Knuth's 2654435761 multiplier mod the Mersenne-ish
prime 1e9+7), chosen because it is expressible identically in any SQL engine
— that is what makes the DuckDB oracle byte-exact.  On a real 100 TB run the
same shape works with ``xxhash64(id, seed)`` for better avalanche; swap one
expression.  Narrow transform, no shuffle: the split column is computed
map-side at scan time and acts as a partition-pruning column once written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MULT = 2654435761
HASH_MOD = 1_000_000_007
N_BUCKETS = 1000


def split_bucket(id_col: Column | str) -> Column:
    """Stable bucket in [0, 1000) from an integer id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c.cast("long") * F.lit(HASH_MULT), F.lit(HASH_MOD)), F.lit(N_BUCKETS))


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    train_per_mille: int = 800,
    val_per_mille: int = 100,
) -> DataFrame:
    """Adds (bucket, split) columns: train/val/test by per-mille bucket
    ranges (default 80/10/10)."""
    b = split_bucket(id_col)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_per_mille, "train")
        .when(F.col("bucket") < train_per_mille + val_per_mille, "val")
        .otherwise("test"),
    )


def split_bucket_sql(id_col: str) -> str:
    """DuckDB twin of ``split_bucket`` (all operands positive, so ``%`` and
    ``pmod`` agree)."""
    return f"((CAST({id_col} AS BIGINT) * {HASH_MULT}) % {HASH_MOD}) % {N_BUCKETS}"
