"""W11 reconcile — anti-entropy convergence (``jobs/Copy.scala:65-129``,
``integration/CopySpec.scala:38-164``)."""

from conftest import edge_rows_df
from flockdb_spark.operators.reconcile import diff_tables, reconcile


def test_reconcile_converges(spark):
    a = edge_rows_df(
        spark,
        [
            (1, 1, 10, 100, 1000, 0),  # fresh, only in A
            (1, 1, 11, 110, 2000, 2),  # newer than B's copy
            (1, 1, 12, 120, 1000, 0),  # same in both
        ],
    )
    b = edge_rows_df(
        spark,
        [
            (1, 1, 11, 110, 1000, 0),  # stale
            (1, 1, 12, 120, 1000, 0),
            (1, 1, 13, 130, 3000, 1),  # only in B
        ],
    )
    out = {(r["destination_id"]): (r["updated_at"], r["state"]) for r in reconcile(a, b).collect()}
    assert out == {10: (1000, 0), 11: (2000, 2), 12: (1000, 0), 13: (3000, 1)}
    # reconcile is symmetric
    out2 = {(r["destination_id"]): (r["updated_at"], r["state"]) for r in reconcile(b, a).collect()}
    assert out == out2
    # rows the copy job would ship to B: A-only + the repaired stale one
    shipped = {r["destination_id"] for r in diff_tables(a, b).collect()}
    assert shipped == {10, 11}
