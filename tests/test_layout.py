"""Storage-layout round-trip: the partitioned/sorted parquet layout that
replaces the reference's two MySQL indexes (SqlShard.scala:64-67, SURVEY §4)."""

from pyspark.sql import functions as F

from flockdb_spark.graph import EdgeStore


def test_write_optimized_roundtrip(spark, store, tmp_path):
    path = str(tmp_path / "edges_opt")
    store.write_optimized(path)
    back = EdgeStore.read_optimized(spark, path)
    assert back.edges.count() == store.edges.count()
    # graph partition pruning: reading one graph touches only its directory
    files = back.graph(2).select(F.input_file_name()).distinct().collect()
    assert all("graph_id=2" in r[0] for r in files)
    # data content identical
    a = sorted(map(tuple, store.edges.collect()))
    b = sorted(map(tuple, back.edges.collect()))
    assert a == b
