"""Semi-structured (JSON) property extraction and rollup.

Event streams carry a free-form JSON ``props`` column; the pipeline needs
typed fields out of it without a pre-declared schema.  ``get_json_object``
is a JVM-side path evaluator (whole-stage codegen, no Python), so extraction
is a per-row projection — the 100 TB cost is the rollup's single partial-agg
shuffle, not the parsing.

No reference counterpart (FlockDB's columns are fixed ints,
``src/main/thrift/Flockdb.thrift:37-51``); this is training-data-pipeline
surface: raw event/metadata feeds are JSON long before they are parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_long(col, path: str) -> F.Column:
    """Extract ``$.path`` from a JSON string column as a nullable long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}").cast("long")


def props_rollup(events: DataFrame, path: str = "k") -> DataFrame:
    """Per event-type rollup of a JSON property: row/user counts and the
    extracted value's sum/min/max.

    Plan: the JSON extraction stays in the scan projection; the aggregation
    is one hash-agg shuffle.  ``n_users`` is an exact distinct — Spark plans
    the standard two-phase expand, the same shape as the exact rollup in
    ``queries_ext.x24``; swap to ``approx_count_distinct`` when a 2%% error
    is acceptable at corpus scale.

    Output: (event_type, n_events, n_users, sum_k, min_k, max_k), integers
    only — portable to any SQL oracle.
    """
    k = json_long("props", path)
    return (
        events.select("event_type", "user_id", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def props_rollup_sql(path: str = "k") -> str:
    """DuckDB twin of :func:`props_rollup` over the ``events`` view."""
    return f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(json_extract(props, '$.{path}') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.{path}') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.{path}') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""
