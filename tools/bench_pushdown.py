"""Measure the PRODUCTION path for the floor-bound point reads.

The scaling study (BENCH_sf1.md) leaves a handful of sub-second point
reads above 2x vs DuckDB — q05/q07/q15-class queries served from the
derived in-memory store, where Spark scans every partition of graph 1.
Their production path is the persisted optimized layout
(`EdgeStore.write_optimized`, SCALE.md §1): partitioned by graph_id
(partition pruning ≙ the reference's per-graph tables) and range-sorted
by (source_id, position) (row-group min/max skipping ≙ the PRIMARY
index).  This tool MEASURES that claim instead of arguing it:

1. builds the optimized layout once from the derived store,
2. runs the three point-read shapes against it (same fixture sources),
3. verifies the results equal the in-memory store path,
4. asserts the plan actually prunes (PartitionFilters + PushedFilters),
5. times Spark-on-layout vs DuckDB-on-the-SAME-layout (identical
   parquet, identical predicate — engine vs engine, no recompute
   asymmetry) and vs the DuckDB oracle that re-derives edges from the
   base tables (the number BENCH_sf1.md races).

Usage: python3 tools/bench_pushdown.py [sf_dir]    (prints one JSON line)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_sfdata/sf3.0"
# the layout always lands under the repo's own scratch area — never inside
# SF_DIR (which may be the read-only /root/testdata)
STORE_DIR = str(
    Path("/root/repo/_sfdata/_pushdown") / Path(SF_DIR.rstrip("/")).name
)


def main() -> None:
    from pyspark.sql import functions as F

    from flockdb_spark.graph import EdgeStore
    from flockdb_spark.queries import params_for, store_for
    from flockdb_spark.session import get_spark

    spark = get_spark(app_name="bench-pushdown")
    spark.sparkContext.setLogLevel("ERROR")

    st = store_for(spark, SF_DIR)
    src10 = params_for(spark, SF_DIR)["src10"]

    t0 = time.perf_counter()
    shutil.rmtree(STORE_DIR, ignore_errors=True)
    st.write_optimized(STORE_DIR)
    build_s = round(time.perf_counter() - t0, 3)

    opt = EdgeStore.read_optimized(spark, STORE_DIR)

    def q05_shape(edges):
        return edges.where(
            (F.col("graph_id") == 1)
            & (F.col("state") == 0)
            & F.col("source_id").isin(src10)
        ).select("source_id", "destination_id", "position")

    def q07_shape(edges):
        from pyspark.sql import Window

        w = Window.partitionBy("source_id").orderBy(F.desc("destination_id"))
        return (
            edges.where(
                (F.col("graph_id") == 1)
                & (F.col("state") == 0)
                & F.col("source_id").isin(src10)
            )
            .select("source_id", "destination_id")
            .withColumn("rn", F.row_number().over(w).cast("int"))
        )

    def q15_shape(edges):
        return edges.where(
            (F.col("graph_id") == 1)
            & (F.col("state") != 1)
            & F.col("source_id").isin(src10)
        ).select("source_id", "destination_id", "state")

    shapes = {"q05_shape": q05_shape, "q07_shape": q07_shape, "q15_shape": q15_shape}

    # correctness: layout path == in-memory store path, row for row
    for name, fn in shapes.items():
        a = sorted(map(tuple, fn(opt.edges).collect()))
        b = sorted(map(tuple, fn(st.edges).collect()))
        assert a == b and len(a) > 0, f"{name}: layout != store ({len(a)} vs {len(b)})"

    # plan: the scan must prune partitions AND push the source filter
    plan = q05_shape(opt.edges)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "graph_id" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]
    assert "PushedFilters" in plan and "source_id" in plan.split("PushedFilters", 1)[1][:300], plan[:2000]

    def time_min3(fn):
        best = None
        for _ in range(3):
            t = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t, 3)
            best = dt if best is None or dt < best else best
        return best

    spark_layout = {
        n: time_min3(lambda fn=fn: fn(opt.edges).write.format("noop").mode("overwrite").save())
        for n, fn in shapes.items()
    }
    spark_store = {
        n: time_min3(lambda fn=fn: fn(st.edges).write.format("noop").mode("overwrite").save())
        for n, fn in shapes.items()
    }
    spark.stop()

    # DuckDB on the SAME layout (identical parquet + predicate)
    import duckdb

    from flockdb_spark.queries import ORACLES  # noqa: F401  (oracle SQL source)

    con = duckdb.connect()
    ids = ", ".join(str(i) for i in src10)
    layout_glob = f"{STORE_DIR}/graph_id=1/*.parquet"
    duck_sql = {
        "q05_shape": f"SELECT source_id, destination_id, position FROM read_parquet('{layout_glob}') WHERE state = 0 AND source_id IN ({ids})",
        "q07_shape": f"SELECT source_id, destination_id, CAST(row_number() OVER (PARTITION BY source_id ORDER BY destination_id DESC) AS INTEGER) AS rn FROM read_parquet('{layout_glob}') WHERE state = 0 AND source_id IN ({ids})",
        "q15_shape": f"SELECT source_id, destination_id, state FROM read_parquet('{layout_glob}') WHERE state <> 1 AND source_id IN ({ids})",
    }
    duck_layout = {
        n: time_min3(lambda s=s: con.execute(s).fetchall()) for n, s in duck_sql.items()
    }

    print(
        json.dumps(
            {
                "metric": "pushdown_point_reads",
                "sf_dir": SF_DIR,
                "layout_build_s": build_s,
                "spark_on_layout": spark_layout,
                "spark_on_derived_store": spark_store,
                "duckdb_on_layout": duck_layout,
            }
        )
    )


if __name__ == "__main__":
    main()
