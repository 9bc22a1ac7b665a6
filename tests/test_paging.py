"""Keyset pagination semantics — cursors forward and backward, mirroring
``unit/SqlShardSpec.scala:217-309`` and ``ResultWindow.scala:34-104``.
"""

from conftest import edge_rows_df
from flockdb_spark.operators.paging import CURSOR_END, CURSOR_START, Cursor, paginate, paginate_all


def fixture(spark):
    # 7 edges of one source, positions 70..10 descending user order
    rows = [(1, 1, d, p, 100, 0) for d, p in [(7, 70), (6, 60), (5, 50), (4, 40), (3, 30), (2, 20), (1, 10)]]
    return edge_rows_df(spark, rows)


def test_first_page(spark):
    p = paginate(fixture(spark), "position", "destination_id", 3)
    assert [r[0] for r in p.rows] == [70, 60, 50]
    assert p.prev_cursor == CURSOR_START
    assert isinstance(p.next_cursor, Cursor) and p.next_cursor.value == 50


def test_walk_forward_exhaustive(spark):
    pages = paginate_all(fixture(spark), "position", "destination_id", 3)
    assert [[r[0] for r in p.rows] for p in pages] == [[70, 60, 50], [40, 30, 20], [10]]
    assert pages[-1].next_cursor == CURSOR_END
    # middle page knows it has neighbors on both sides
    assert isinstance(pages[1].prev_cursor, Cursor) and pages[1].prev_cursor.backward


def test_walk_backward(spark):
    df = fixture(spark)
    pages = paginate_all(df, "position", "destination_id", 3)
    # step back from the last page: must reproduce the middle page
    back = paginate(df, "position", "destination_id", 3, pages[-1].prev_cursor)
    assert back.rows == pages[1].rows
    # and from there back again: the first page
    back2 = paginate(df, "position", "destination_id", 3, back.prev_cursor)
    assert back2.rows == pages[0].rows
    assert back2.prev_cursor == CURSOR_START  # nothing before the first page


def test_page_larger_than_set(spark):
    p = paginate(fixture(spark), "position", "destination_id", 100)
    assert len(p.rows) == 7
    assert p.next_cursor == CURSOR_END and p.prev_cursor == CURSOR_START


def test_duplicate_sort_values_never_skip(spark):
    # compound (sort, id) cursor keeps ties total — the reference's single
    # column position cursor can skip ties; ours must not
    rows = [(1, 1, d, 50, 100, 0) for d in range(1, 8)]  # all same position
    df = edge_rows_df(spark, rows)
    pages = paginate_all(df, "position", "destination_id", 3)
    seen = [r[1] for p in pages for r in p.rows]
    assert seen == [7, 6, 5, 4, 3, 2, 1]


def test_empty_set(spark):
    df = edge_rows_df(spark, [])
    p = paginate(df, "position", "destination_id", 3)
    assert p.rows == [] and p.next_cursor == CURSOR_END and p.prev_cursor == CURSOR_START
