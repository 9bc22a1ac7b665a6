"""Exact integer epoch extraction for timestamp columns, whatever the parquet
reader surfaced them as.

The driver's testdata has shipped the ``events.ts`` column as both
TIMESTAMP(NANOS) (read as raw int64 nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]``
(surfaced as TIMESTAMP_NTZ).  Any operator that touches an event timestamp
must therefore resolve the column's runtime dtype and pick the matching
integer arithmetic — all paths use integer ``div`` / ``unix_*`` so results
are bit-exact against DuckDB's ``epoch`` / ``epoch_ms`` / ``epoch_us``
(exact for positive epochs; the synthetic data is all post-1970).

The session timezone is pinned to UTC (``session.get_spark``), so casting
TIMESTAMP_NTZ to TIMESTAMP is an identity re-tag, not a wall-clock shift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: nanoseconds per unit
_NANOS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000}
_UNIX = {"s": F.unix_seconds, "ms": F.unix_millis, "us": F.unix_micros}


def epoch_col(df: DataFrame, name: str, unit: str = "s") -> Column:
    """Integer epoch (``unit`` in s / ms / us, BIGINT) for ``df[name]``.

    Handles int64-nanos (legacy nanosAsLong reads), TIMESTAMP and
    TIMESTAMP_NTZ inputs with exact integer arithmetic on every path.
    """
    if unit not in _NANOS:
        raise ValueError(f"unit must be one of {sorted(_NANOS)}, got {unit!r}")
    dtype = dict(df.dtypes)[name]
    if dtype in ("bigint", "long"):  # raw nanoseconds
        return F.expr(f"`{name}` div {_NANOS[unit]}")
    return _UNIX[unit](F.col(name).cast("timestamp"))
