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
