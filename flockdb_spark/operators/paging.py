"""Keyset (cursor) pagination — never OFFSET (``doc/blog.md:63-65``).

Reproduces the reference's ResultWindow semantics
(``ResultWindow.scala:34-104``, generic pager ``shards/SqlShard.scala:258-314``):

- a page of N rows ordered by a sort column (DESC by default),
- ``next_cursor`` when more rows follow, ``prev_cursor`` when rows precede,
- backward paging expressed as a negative cursor: scan ASC past the cursor
  row, then reverse the page (``ResultWindow.scala:44-57``,
  ``SqlShard.scala:265-275``).

Differences from the reference, on purpose:
- the cursor is compound ``(sort_value, id)`` so pagination is total even with
  duplicate sort values (the reference's single-column position cursor can skip
  ties);
- the "fetch the continue-cursor probe in the same round trip via UNION ALL"
  trick (``SqlShard.scala:263-278``) is kept: one Spark job serves the page
  *and* both cursor probes.

At scale the page query is a filter + TakeOrderedAndProject — no shuffle, no
full materialization of the underlying set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# sentinel cursors (Cursor.scala:19-30)
CURSOR_START = "start"
CURSOR_END = "end"


@dataclass(frozen=True)
class Cursor:
    """Compound keyset cursor. ``backward=True`` pages toward newer rows."""

    value: int
    id: int
    backward: bool = False

    def flipped(self) -> "Cursor":
        return Cursor(self.value, self.id, not self.backward)


@dataclass
class Page:
    rows: list  # (sort_value, id) tuples in user-facing order
    next_cursor: Cursor | str
    prev_cursor: Cursor | str
    full_rows: list | None = None  # whole source rows (selectEdges, R8)


def _tuple_cmp(sort_col: Column, id_col: Column, cur: Cursor, before: bool) -> Column:
    """(sort, id) <cursor  /  >cursor — lexicographic, via struct comparison."""
    probe = F.struct(F.lit(cur.value).cast("long"), F.lit(cur.id).cast("long"))
    this = F.struct(sort_col.cast("long"), id_col.cast("long"))
    return this < probe if before else this > probe


def paginate(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    count: int,
    cursor: Cursor | str = CURSOR_START,
    descending: bool = True,
    include_rows: bool = False,
) -> Page:
    """One page plus both cursors, in a single Spark job.

    ``df`` must contain ``sort_col`` and ``id_col``.  Rows are returned in the
    user-facing order (descending by default), regardless of paging direction.
    """
    s, i = F.col(sort_col), F.col(id_col)
    # "desc" here means the user-facing ordering; a backward cursor walks it
    # in reverse and the page is flipped before returning.
    walking_back = isinstance(cursor, Cursor) and cursor.backward

    if isinstance(cursor, Cursor):
        if walking_back:
            page_pred = _tuple_cmp(s, i, cursor, before=not descending)
            probe_pred = _tuple_cmp(s, i, cursor, before=descending)
        else:
            page_pred = _tuple_cmp(s, i, cursor, before=descending)
            probe_pred = _tuple_cmp(s, i, cursor, before=not descending)
        probe = (
            df.where(probe_pred)
            .select(s.alias("_s"), i.alias("_i"))
            .limit(1)
            .withColumn("_probe", F.lit(True))
        )
        page_df = df.where(page_pred)
    else:
        probe = None
        page_df = df

    scan_desc = descending != walking_back
    order = [s.desc(), i.desc()] if scan_desc else [s.asc(), i.asc()]
    payload = (
        [F.struct(*[F.col(c) for c in df.columns]).alias("_row")]
        if include_rows
        else [F.lit(None).cast("string").alias("_row")]
    )
    page_q = (
        page_df.select(s.alias("_s"), i.alias("_i"), *payload)
        .orderBy(*order)
        .limit(count + 1)
        .withColumn("_probe", F.lit(False))
    )
    if probe is not None:
        probe = probe.withColumn(
            "_row", F.lit(None).cast(dict(page_q.dtypes)["_row"])
        ).select(*page_q.columns)
    # same-trip probe: page and opposite-direction existence check in one job
    # (mirrors the UNION ALL at SqlShard.scala:268-271)
    q = page_q.unionByName(probe) if probe is not None else page_q
    collected = q.collect()

    page_recs = [r for r in collected if not r["_probe"]]
    has_opposite = any(r["_probe"] for r in collected)
    has_more = len(page_recs) > count
    page_recs = page_recs[:count]
    if walking_back:
        page_recs.reverse()
        first_more, last_more = has_more, has_opposite
    else:
        first_more, last_more = has_opposite, has_more
    rows = [(r["_s"], r["_i"]) for r in page_recs]
    full_rows = [r["_row"] for r in page_recs] if include_rows else None

    next_cursor: Cursor | str = CURSOR_END
    prev_cursor: Cursor | str = CURSOR_START
    if rows:
        if last_more:
            next_cursor = Cursor(rows[-1][0], rows[-1][1], backward=False)
        if first_more:
            prev_cursor = Cursor(rows[0][0], rows[0][1], backward=True)
    return Page(rows, next_cursor, prev_cursor, full_rows)


def paginate_all(
    df: DataFrame, sort_col: str, id_col: str, count: int, descending: bool = True
) -> list[Page]:
    """Walk every page forward — the Q6 fixture helper."""
    pages: list[Page] = []
    cursor: Cursor | str = CURSOR_START
    while True:
        page = paginate(df, sort_col, id_col, count, cursor, descending)
        if not page.rows:
            break
        pages.append(page)
        if page.next_cursor == CURSOR_END:
            break
        cursor = page.next_cursor
    return pages
