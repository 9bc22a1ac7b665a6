"""Range (point-in-interval) join — the second "operator Spark lacks"
example from the task brief, as bin decomposition.

A naive theta-join `p.t BETWEEN i.start AND i.end` degenerates to a per-key
cross product (Spark plans BroadcastNestedLoop for pure inequality joins).
The scale path: decompose each interval into the fixed-width time bins it
overlaps, bin each point, equi-join on (key, bin), then apply the exact
containment predicate.  Join fan-out per interval = its span / bin_size;
pick bin_size near the typical span so most intervals explode into O(1)
bins and the equi-join shuffles hash-partitioned like any other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bin_size: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) with
    start ≤ point ≤ end.  Output: all columns of both sides (caller projects).

    ``bin_size`` is in the time columns' units.  Correctness is independent
    of the choice (each point owns exactly one bin, so a matching interval
    joins it exactly once — no dedup needed); only the explode factor and
    join balance depend on it.

    ``how``: ``inner`` or ``left`` (left preserves points with no containing
    interval — safe because each point owns exactly one bin, so an unmatched
    point emits exactly one null row).  Other join types would duplicate
    unmatched intervals once per exploded bin and are rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: only 'inner'/'left' are well-defined under bin "
            "decomposition (an unmatched interval appears once per bin)"
        )
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bin_size))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_size), F.floor(F.col(end_col) / bin_size)
            )
        ),
    )
    # the containment predicate lives IN the join condition (not a post-join
    # filter) so outer semantics survive: a bin-matched but out-of-range
    # interval must not consume the point's null row
    cond = F.lit(True)
    for k in on:
        cond = cond & (p[k] == i[k])
    cond = (
        cond
        & (p["_bin"] == i["_bin"])
        & F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    joined = p.join(i, cond, how)
    # project away the duplicated key/bin columns from the interval side
    return joined.drop(i["_bin"]).drop(p["_bin"]).drop(*[i[k] for k in on])
