"""SparkSession factory with the engine's scale-oriented defaults.

Local testing runs on local[N]; the same conf block is what we would ship on a
1000-executor cluster — AQE for runtime re-planning (skew joins, empty-relation
propagation), adaptive shuffle partition coalescing, Arrow for the few
pandas-UDF paths, and UTC so epoch arithmetic matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flockdb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime join-side selection, skew splitting, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the data's size, not the cluster's parallelism: at small
        # scale this collapses empty 32-way shuffles to a handful of tasks; at
        # 100 TB the same advisory size yields thousands of right-sized tasks
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # epoch arithmetic must be timezone-stable to match the oracle
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Arrow batches for the pandas-UDF slow path (similarity/multimodal)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
