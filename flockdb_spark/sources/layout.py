"""Z-order (Morton) multi-dimensional clustering for parquet layouts.

A single-column sort gives tight parquet min/max stats on ONE column; a
2-D box predicate on (x, y) then prunes on x only and every file still
spans the full y range.  Interleaving the two columns' bits into one
Morton key and range-partitioning + sorting on it keeps files compact in
BOTH dimensions, so a box predicate overlaps O(perimeter) files instead of
O(stripe) — the `OPTIMIZE ZORDER BY` of Delta/Iceberg, built from plain
DataFrame ops (repartitionByRange + sortWithinPartitions; no custom
writer needed).

Everything is exact integer bit arithmetic (shift/and/multiply), identical
in any engine — :func:`zorder_key_sql` is the DuckDB verification twin —
and stays inside whole-stage codegen on Spark.

At 100 TB: the z-key projection is map-side; `repartitionByRange` samples
the key distribution (one extra pass over a sample, not the data) and
produces balanced output files regardless of key skew; file-level pruning
then serves 2-D range workloads (time × tenant, orderkey × partkey)
without a secondary index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 20  # per-coordinate bits: 2^20 ids per dim, 40-bit key


def zorder_key(
    xcol: Column | str, ycol: Column | str, bits: int = ZORDER_BITS
) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of x lands at key bit 2i, bit i of y at 2i+1.
    Coordinates are taken mod 2^bits (documented truncation — choose
    ``bits`` to cover the domain)."""
    x = (F.col(xcol) if isinstance(xcol, str) else xcol).cast("long")
    y = (F.col(ycol) if isinstance(ycol, str) else ycol).cast("long")
    x, y = F.pmod(x, F.lit(1 << bits)), F.pmod(y, F.lit(1 << bits))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        key = key + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return key


def zorder_key_sql(x: str, y: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB twin of :func:`zorder_key`."""
    m = 1 << bits
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}) % {m}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(((({y}) % {m}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = 32,
    bits: int = ZORDER_BITS,
) -> None:
    """Persist ``df`` as parquet clustered on the (xcol, ycol) z-curve:
    range-partition by the Morton key (balanced files via sampling), sort
    within each file (tight row-group stats), drop the key from the data.
    """
    keyed = df.withColumn("_zkey", zorder_key(xcol, ycol, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_overlap_count(
    spark_df: DataFrame,
    xcol: str,
    ycol: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
) -> tuple[int, int]:
    """Measure file-level prunability: (files overlapping the box, total
    files), from per-file min/max of the two columns — the same statistics
    parquet footers expose to the scan planner.  Used by tests to prove
    the z-ordered layout dominates a linear sort for 2-D boxes."""
    stats = (
        spark_df.select(
            F.input_file_name().alias("f"), F.col(xcol).alias("x"), F.col(ycol).alias("y")
        )
        .groupBy("f")
        .agg(
            F.min("x").alias("xlo"), F.max("x").alias("xhi"),
            F.min("y").alias("ylo"), F.max("y").alias("yhi"),
        )
        .collect()
    )
    (xl, xh), (yl, yh) = x_range, y_range
    hit = sum(1 for r in stats if r["xlo"] <= xh and r["xhi"] >= xl and r["ylo"] <= yh and r["yhi"] >= yl)
    return hit, len(stats)
