"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query definitions live in ``flockdb_spark.queries`` (the declared
FlockDB query set, SURVEY.md §2.e) and ``flockdb_spark.functions`` (the
LLM-data-pipeline extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flockdb_spark import queries as _q  # noqa: E402
from flockdb_spark import queries_ext as _qx  # noqa: E402,F401  (registers x-series)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q10 supplier-pair
    intersection — load → filter → semi-join → project (SURVEY.md §7.1)."""
    return _q.QUERIES["q10_intersection"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
