"""As-of join (operators/asof.py): strict vs non-strict time matching,
no-match nulls, and the single-shuffle plan shape."""

from pyspark.sql import functions as F

from flockdb_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 50, "c"), (2, 500, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10), (1, 150, 15), (2, 600, 60)], "k long, rt long, v int"
    )
    return left, right


def test_asof_non_strict(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["v"], strict=False)
    got = {r["tag"]: r["asof_v"] for r in out.collect()}
    # t=100 sees the rt=100 row (<=); t=200 sees rt=150; t=50 has no match;
    # k=2 at t=500 precedes its only right row
    assert got == {"a": 10, "b": 15, "c": None, "d": None}


def test_asof_strict(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["v"], strict=True)
    got = {r["tag"]: r["asof_v"] for r in out.collect()}
    assert got == {"a": None, "b": 15, "c": None, "d": None}  # equal time excluded


def test_asof_is_one_shuffle(spark):
    from test_plans import plan_str

    left, right = _frames(spark)
    plan = plan_str(asof_join(left, right, ["k"], "t", "rt", ["v"]), "simple")
    # union + window sweep: exactly one hash exchange on the key, no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_matches_theta_join_and_avoids_nested_loop(spark):
    from test_plans import plan_str

    from flockdb_spark.operators.rangejoin import point_in_interval_join

    points = spark.createDataFrame(
        [(1, 5, "p1"), (1, 25, "p2"), (1, 99, "p3"), (2, 10, "p4")],
        "k long, t long, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, 0, 10, "i1"), (1, 20, 40, "i2"), (2, 50, 60, "i3")],
        "k long, s long, e long, iid string",
    )
    out = point_in_interval_join(points, intervals, ["k"], "t", "s", "e", bin_size=7)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    # brute-force reference
    expected = {
        (p["pid"], i["iid"])
        for p in points.collect()
        for i in intervals.collect()
        if p["k"] == i["k"] and i["s"] <= p["t"] <= i["e"]
    }
    assert got == expected == {("p1", "i1"), ("p2", "i2")}
    plan = plan_str(out, "simple")
    assert "NestedLoop" not in plan  # the whole point: stays an equi hash join
