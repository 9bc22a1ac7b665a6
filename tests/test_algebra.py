"""Set-algebra operators vs plain python sets — the analog of the reference's
SeqQuery-mocked operator specs (``unit/IntersectionQuerySpec.scala`` etc.).
"""

from conftest import edge_rows_df
from flockdb_spark.graph import EdgeStore
from flockdb_spark.operators.algebra import (
    Difference,
    Intersection,
    Simple,
    Term,
    Union,
    WhereIn,
)
from flockdb_spark.operators.counts import size_estimate


def make_store(spark):
    # source 1 → {10,11,12,13}; source 2 → {12,13,14}; source 3 → {13,99}
    rows = []
    for s, dests in [(1, [10, 11, 12, 13]), (2, [12, 13, 14]), (3, [13, 99])]:
        rows += [(1, s, d, d * 10, 100, 0) for d in dests]
    rows.append((1, 1, 50, 500, 100, 2))  # archived edge: excluded at state=(0,)
    return EdgeStore.from_edges(spark, edge_rows_df(spark, rows))


def ids(node, store):
    return {r["id"] for r in node.ids(store).collect()}


def test_simple_and_state_filter(spark):
    st = make_store(spark)
    assert ids(Simple(Term(1, 1)), st) == {10, 11, 12, 13}
    assert ids(Simple(Term(1, 1, states=(0, 2))), st) == {10, 11, 12, 13, 50}


def test_backward(spark):
    st = make_store(spark)
    assert ids(Simple(Term(1, 13, forward=False)), st) == {1, 2, 3}


def test_where_in_small_and_large(spark):
    st = make_store(spark)
    assert ids(WhereIn(Term(1, 1), (11, 13, 77)), st) == {11, 13}
    big = tuple(range(5, 300))  # > INLINE_IN_LIST_MAX → broadcast semi-join path
    assert ids(WhereIn(Term(1, 1), big), st) == {10, 11, 12, 13}


def test_set_ops(spark):
    st = make_store(spark)
    s1, s2 = Simple(Term(1, 1)), Simple(Term(1, 2))
    assert ids(Intersection(s1, s2), st) == {12, 13}
    assert ids(Union(s1, s2), st) == {10, 11, 12, 13, 14}
    assert ids(Difference(s1, s2), st) == {10, 11}
    assert ids(Difference(s2, s1), st) == {14}


def test_nested(spark):
    st = make_store(spark)
    s1, s2, s3 = (Simple(Term(1, s)) for s in (1, 2, 3))
    assert ids(Union(Intersection(s1, s2), s3), st) == {12, 13, 99}
    assert ids(Difference(Union(s1, s2), s3), st) == {10, 11, 12, 14}


def test_count2_formulas(spark):
    st = make_store(spark)
    s1, s2 = Simple(Term(1, 1)), Simple(Term(1, 2))
    # leaf counts come from metadata (state-0 edges): 4 and 3
    assert size_estimate(st, s1) == 4
    assert size_estimate(st, Intersection(s1, s2)) == 0  # int(3 * 0.1)
    assert size_estimate(st, Union(s1, s2)) == 4
    assert size_estimate(st, Difference(s1, s2)) == 4
    assert size_estimate(st, WhereIn(Term(1, 1), (1, 2, 3))) == 3


def test_batch_select2_mixed_programs(spark):
    """R18 one-pass batch: mixed op kinds share a single scan + flags agg,
    each program paged independently in the reference's Cursor.Start page
    order (destination id DESC, SqlShard.select's default)."""
    from flockdb_spark.operators.batch import batch_select2

    st = make_store(spark)
    programs = [
        ("intersection", 1, 2),
        ("union", 2, 3),
        ("difference", 1, 2),
        ("difference", 2, 1),
    ]
    out = batch_select2(st, 1, programs, page_count=2)
    got = {
        (r["qix"], r["op"]): []
        for r in out.select("qix", "op").distinct().collect()
    }
    for r in out.orderBy("qix", "id").collect():
        got[(r["qix"], r["op"])].append(r["id"])
    assert got[(0, "intersection")] == [12, 13]
    assert got[(1, "union")] == [14, 99]  # Start page of {12,13,14,99}, id DESC
    assert got[(2, "difference")] == [10, 11]
    assert got[(3, "difference")] == [14]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        batch_select2(st, 1, [("xor", 1, 2)])
