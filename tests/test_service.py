"""End-to-end service flows — the analog of ``integration/EdgesSpec.scala``:
add/remove/archive/negate through execute(), reads through the 9-method API,
mass actions, effective-state coupling.
"""

import pytest

from conftest import edge_rows_df
from flockdb_spark.graph import EdgeStore
from flockdb_spark.operators.paging import Cursor
from flockdb_spark.plans.compiler import (
    ExecuteOperation,
    ExecuteOperationType,
    QueryTerm,
    SelectOperation,
    SelectOperationType,
)
from flockdb_spark.service import FlockService, SelectQuery


@pytest.fixture()
def svc(spark):
    rows = [(1, 1, d, d * 10, 100, 0) for d in (10, 11, 12)]
    rows += [(1, 2, d, d * 10, 100, 0) for d in (11, 12, 13)]
    return FlockService(EdgeStore.from_edges(spark, edge_rows_df(spark, rows)))


def op(kind, src, dests=None, graph=1, fwd=True):
    return ExecuteOperation(kind, QueryTerm(src, graph, fwd, dests))


def test_point_reads(svc):
    assert svc.contains(1, 1, 10)
    assert not svc.contains(1, 1, 99)
    assert svc.get(1, 1, 10)["position"] == 100
    assert svc.get_metadata(1, 1)["count"] == 3
    assert svc.contains_metadata(2, 1) and not svc.contains_metadata(9, 1)


def test_add_remove_lifecycle(svc):
    svc.execute([op(ExecuteOperationType.ADD, 1, (99,))], at=2000)
    assert svc.contains(1, 1, 99)
    svc.execute([op(ExecuteOperationType.REMOVE, 1, (99,))], at=3000)
    assert not svc.contains(1, 1, 99)
    # negate: still "contains" (state Negative counts, EdgesService.scala:51-60)
    svc.execute([op(ExecuteOperationType.NEGATE, 1, (10,))], at=3000)
    assert svc.contains(1, 1, 10)
    assert svc.get(1, 1, 10)["state"] == 3


def test_select2_compound_and_paging(svc):
    prog = [
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1)),
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(2, 1)),
        SelectOperation(SelectOperationType.INTERSECTION),
    ]
    [page] = svc.select2([SelectQuery(prog, page_count=1)])
    assert [r[1] for r in page.rows] == [12]
    assert isinstance(page.next_cursor, Cursor)
    [page2] = svc.select2([SelectQuery(prog, page_count=1, cursor=page.next_cursor)])
    assert [r[1] for r in page2.rows] == [11]


def test_select_edges_full_rows(svc):
    page = svc.select_edges(1, 1, count=2)
    # position DESC: dests 12, 11 first; full edge rows carried (R8)
    assert [r["destination_id"] for r in page.full_rows] == [12, 11]
    assert page.full_rows[0]["state"] == 0 and page.full_rows[0]["position"] == 120
    page2 = svc.select_edges(1, 1, count=2, cursor=page.next_cursor)
    assert [r["destination_id"] for r in page2.full_rows] == [10]
    # intersectEdges (R10): id-list restricted
    page3 = svc.select_edges(1, 1, destination_ids=(10, 12, 77), count=5)
    assert [r["destination_id"] for r in page3.full_rows] == [12, 10]


def test_select_edges_batch_one_scan(svc):
    """Batch selectEdges (Flockdb.thrift:158-160 takes list<EdgeQuery>):
    the whole Start-cursor batch answers in one scan and each page matches
    the single-query path exactly — rows, order, and has-more cursor."""
    from flockdb_spark.operators.algebra import Term
    from flockdb_spark.operators.paging import CURSOR_END
    from flockdb_spark.service import EdgeQuery

    pages = svc.select_edges_batch(
        [
            EdgeQuery(Term(1, 1), count=2),
            EdgeQuery(Term(1, 2), count=5),
            EdgeQuery(Term(1, 1), destination_ids=(10, 12, 77), count=5),
            EdgeQuery(Term(1, 12, forward=False), count=5),  # backward term
        ]
    )
    assert [r["destination_id"] for r in pages[0].full_rows] == [12, 11]
    assert isinstance(pages[0].next_cursor, Cursor)  # has-more probe fired
    assert [r["destination_id"] for r in pages[1].full_rows] == [13, 12, 11]
    assert pages[1].next_cursor == CURSOR_END
    assert [r["destination_id"] for r in pages[2].full_rows] == [12, 10]
    # backward: who points at 12 — page id column is source_id
    assert [r["source_id"] for r in pages[3].full_rows] == [2, 1]
    # a mid-walk cursor falls back to per-query paging, same result as single
    follow = svc.select_edges_batch(
        [EdgeQuery(Term(1, 1), count=2, cursor=pages[0].next_cursor)]
    )
    assert [r["destination_id"] for r in follow[0].full_rows] == [10]


def test_deprecated_select_wrapper(svc):
    """select(program, page) (Flockdb.thrift:166-167) == one select2 query."""
    prog = [
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1)),
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(2, 1)),
        SelectOperation(SelectOperationType.INTERSECTION),
    ]
    page = svc.select(prog, page_count=5)
    [page2] = svc.select2([SelectQuery(prog, page_count=5)])
    assert page.rows == page2.rows and page.next_cursor == page2.next_cursor


def test_strict_get_raises_flock_exception(svc):
    """Reference parity: Thrift get/get_metadata THROW on absence
    (Flockdb.thrift:141-149); strict=True reproduces that."""
    from flockdb_spark.service import FlockException

    assert svc.get(1, 1, 99) is None
    with pytest.raises(FlockException):
        svc.get(1, 1, 99, strict=True)
    assert svc.get_metadata(99, 1) is None
    with pytest.raises(FlockException):
        svc.get_metadata(99, 1, strict=True)
    # present rows behave identically in both modes
    assert svc.get(1, 1, 10, strict=True)["position"] == 100


def test_mass_archive_then_readd(svc):
    svc.execute([op(ExecuteOperationType.ARCHIVE, 1)], at=5000)
    assert not svc.contains(1, 1, 10)
    md = svc.get_metadata(1, 1)
    assert md["state"] == 2 and md["count"] == 3  # 3 edges at the vertex state
    # single add to archived vertex is forced to Archived (Single.scala:106)
    svc.execute([op(ExecuteOperationType.ADD, 1, (55,))], at=6000)
    assert svc.get(1, 1, 55)["state"] == 2
    # wildcard add restores everything
    svc.execute([op(ExecuteOperationType.ADD, 1)], at=7000)
    assert svc.contains(1, 1, 10) and svc.contains(1, 1, 55)
    assert svc.get_metadata(1, 1)["count"] == 4


def test_count2(svc):
    prog = [
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1)),
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(2, 1)),
        SelectOperation(SelectOperationType.INTERSECTION),
    ]
    [est] = svc.count2([prog])
    assert est == 0  # int(min(3,3) * 0.1)


def test_select_all_and_bulk_load(svc, spark):
    """R16 copy-source scan + W8 unsafe bulk append (SqlShard.scala:216-238,402-430)."""
    allrows = svc.select_all(1).collect()
    assert [(r["source_id"], r["destination_id"]) for r in allrows] == sorted(
        (r["source_id"], r["destination_id"]) for r in allrows
    )
    md = svc.select_all_metadata(1).collect()
    assert [r["source_id"] for r in md] == [1, 2]

    n0 = svc.store.edges.count()
    svc.bulk_load(edge_rows_df(spark, [(1, 3, 30, 300, 100, 0)]))
    assert svc.store.edges.count() == n0 + 1
    # bulk load bypasses LWW: a stale duplicate row lands as-is (copy path),
    # and reconcile/merge is the documented way to repair afterwards
    svc.bulk_load(edge_rows_df(spark, [(1, 3, 30, 300, 50, 2)]))
    assert svc.store.edges.where("source_id = 3").count() == 2


def test_select2_batch_one_scan(svc):
    """R18 — an N-program Start-cursor batch runs as ONE edge-table scan
    (batch_flat_pages), and the facade's pages match per-program evaluation."""
    from flockdb_spark.operators.batch import batch_flat_pages
    from flockdb_spark.plans.compiler import compile_select

    S, I, U, D = (
        SelectOperationType.SIMPLE_QUERY,
        SelectOperationType.INTERSECTION,
        SelectOperationType.UNION,
        SelectOperationType.DIFFERENCE,
    )

    p_int = [SelectOperation(S, QueryTerm(1, 1)), SelectOperation(S, QueryTerm(2, 1)), SelectOperation(I)]
    p_uni = [SelectOperation(S, QueryTerm(1, 1)), SelectOperation(S, QueryTerm(2, 1)), SelectOperation(U)]
    p_dif = [SelectOperation(S, QueryTerm(2, 1)), SelectOperation(S, QueryTerm(1, 1)), SelectOperation(D)]
    # nested: (1 ∪ 2) − (1 ∩ 2) — 4 leaves, depth 3
    p_nested = [
        SelectOperation(S, QueryTerm(1, 1)),
        SelectOperation(S, QueryTerm(2, 1)),
        SelectOperation(U),
        SelectOperation(S, QueryTerm(1, 1)),
        SelectOperation(S, QueryTerm(2, 1)),
        SelectOperation(I),
        SelectOperation(D),
    ]
    queries = [SelectQuery(p, page_count=2) for p in (p_int, p_uni, p_dif, p_nested)]

    # the batched plan scans the edge table exactly once
    trees = [compile_select(q.operations) for q in queries]
    df = batch_flat_pages(svc.store, [(t, q.page_count) for t, q in zip(trees, queries)])
    assert df is not None
    jvm = df.sparkSession._jvm
    simple = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert simple.count("Scan ExistingRDD") == 1, simple

    # s1={10,11,12}, s2={11,12,13}; pages are id DESC (SqlShard.select default)
    pages = svc.select2(queries)
    assert [r[1] for r in pages[0].rows] == [12, 11]  # 1∩2
    assert pages[0].next_cursor == "end"
    assert [r[1] for r in pages[1].rows] == [13, 12]  # 1∪2, more behind
    assert isinstance(pages[1].next_cursor, Cursor)
    assert [r[1] for r in pages[2].rows] == [13]  # 2−1
    assert [r[1] for r in pages[3].rows] == [13, 10]  # (1∪2)−(1∩2)

    # cursor continuation falls back to the per-program path, page-coherently
    [page2] = svc.select2([SelectQuery(p_uni, page_count=2, cursor=pages[1].next_cursor)])
    assert [r[1] for r in page2.rows] == [11, 10]


def test_query_classes_tag_scheduler_pools(svc, spark):
    """O5 (config/production.scala:26-35): every service action runs under
    its class's FAIR scheduler pool and restores the caller's properties."""
    from flockdb_spark.operators.classes import POOLS, QueryClass, query_class

    sc = spark.sparkContext
    seen = {}
    orig = query_class

    # observe the pool while an action runs by sampling the local property
    # inside the context manager
    import flockdb_spark.service as svcmod

    class Probe:
        def __init__(self, inner):
            self.inner = inner

        def __enter__(self):
            out = self.inner.__enter__()
            # the property is LIVE inside the action scope
            seen[self.cls] = sc.getLocalProperty("spark.scheduler.pool")
            return out

        def __exit__(self, *a):
            return self.inner.__exit__(*a)

    def probing(spark_, cls, timeout=None):
        p = Probe(orig(spark_, cls, timeout))
        p.cls = cls
        return p

    svcmod.query_class, svcmod_orig = probing, svcmod.query_class
    try:
        svc.get(1, 1, 10)
        svc.get_metadata(1, 1)
        svc.count2([[SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1, True))]])
        svc.select_edges(1, 1)
        svc.select_edges(1, 1, destination_ids=(10, 11))
    finally:
        svcmod.query_class = svcmod_orig
    assert seen[QueryClass.SELECT_SINGLE] == "flock_select_single"
    assert seen[QueryClass.SELECT_METADATA] == "flock_select_metadata"
    assert seen[QueryClass.SELECT] == "flock_select"
    # the small IN-list page routes to the SMALL intersection class
    assert seen[QueryClass.SELECT_INTERSECTION_SMALL] == "flock_select_intersection_small"
    # caller's property restored after every action
    assert sc.getLocalProperty("spark.scheduler.pool") in (None, "")


def test_query_class_classification_and_timeout(svc, spark):
    """class_for_trees mirrors the reference's intersection split; the
    watchdog cancels a over-budget action with FlockTimeoutException."""
    import time as _t

    from pyspark.sql import functions as F

    from flockdb_spark.operators.algebra import INLINE_IN_LIST_MAX
    from flockdb_spark.operators.classes import (
        FlockTimeoutException,
        QueryClass,
        class_for_trees,
        query_class,
    )
    from flockdb_spark.plans.compiler import compile_select

    def prog(*ops):
        return compile_select(list(ops))

    simple = prog(SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1, True)))
    small_in = prog(
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1, True, (10, 11)))
    )
    big_in = prog(
        SelectOperation(
            SelectOperationType.SIMPLE_QUERY,
            QueryTerm(1, 1, True, tuple(range(INLINE_IN_LIST_MAX + 1))),
        )
    )
    inter = prog(
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(1, 1, True)),
        SelectOperation(SelectOperationType.SIMPLE_QUERY, QueryTerm(2, 1, True)),
        SelectOperation(SelectOperationType.INTERSECTION),
    )
    M = INLINE_IN_LIST_MAX
    assert class_for_trees([simple], M) == QueryClass.SELECT
    assert class_for_trees([small_in], M) == QueryClass.SELECT_INTERSECTION_SMALL
    assert class_for_trees([big_in], M) == QueryClass.SELECT_INTERSECTION
    assert class_for_trees([inter], M) == QueryClass.SELECT_INTERSECTION_SMALL
    assert class_for_trees([simple, big_in], M) == QueryClass.SELECT_INTERSECTION

    # watchdog: a deliberately slow job under a 0.4s budget is cancelled and
    # surfaces the timeout twin (SqlQueryTimeoutException parity)
    slow = (
        spark.range(0, 200)
        .select(F.col("id"))
        .mapInPandas(
            lambda it: (_t.sleep(0.15) or pdf for pdf in it),  # ~sleep per batch
            "id long",
        )
    )
    t0 = _t.monotonic()
    with pytest.raises(FlockTimeoutException):
        with query_class(spark, QueryClass.SELECT, timeout=0.4):
            slow.crossJoin(slow.withColumnRenamed("id", "id2")).count()
    assert _t.monotonic() - t0 < 30  # cancelled, not run to completion


def test_execute_timeout_never_tears_the_store(svc):
    """ADVICE r7 (medium): an O5 timeout cancelling execute() mid-write must
    leave the store EXACTLY as it was — never edges updated with metadata
    stale.  The fix materializes both checkpoints into locals inside the
    timeout scope and swaps the store only after both succeed."""
    from flockdb_spark.operators.classes import FlockTimeoutException, QueryClass

    before_edges = svc.store.edges
    before_meta = svc.store.metadata
    before_rows = sorted(tuple(r) for r in before_edges.collect())
    before_meta_rows = sorted(tuple(r) for r in before_meta.collect())

    svc.timeouts[QueryClass.EXECUTE] = 0.001  # fires long before the merge jobs end
    try:
        with pytest.raises(FlockTimeoutException):
            svc.execute([op(ExecuteOperationType.ADD, 1, (99,))], at=5000)
    finally:
        svc.timeouts.pop(QueryClass.EXECUTE, None)

    # both halves are the PRE-WRITE frames — object identity, not just value
    assert svc.store.edges is before_edges
    assert svc.store.metadata is before_meta
    assert sorted(tuple(r) for r in svc.store.edges.collect()) == before_rows
    assert sorted(tuple(r) for r in svc.store.metadata.collect()) == before_meta_rows
    # and the service still works: a clean retry applies normally
    svc.execute([op(ExecuteOperationType.ADD, 1, (99,))], at=5000)
    assert svc.contains(1, 1, 99)


def test_select_edges_batch_classified_like_single(svc, spark):
    """ADVICE r7: a batch of WhereIn pages must land in the intersection
    pool (class_for_trees), not unconditionally in SELECT — parity with the
    single-query path and the reference's per-query classification."""
    import flockdb_spark.service as svcmod
    from flockdb_spark.service import CURSOR_START, EdgeQuery
    from flockdb_spark.operators.algebra import Term

    sc = spark.sparkContext
    seen = []
    orig = svcmod.query_class

    class Probe:
        def __init__(self, inner, cls):
            self.inner, self.cls = inner, cls

        def __enter__(self):
            out = self.inner.__enter__()
            seen.append((self.cls, sc.getLocalProperty("spark.scheduler.pool")))
            return out

        def __exit__(self, *a):
            return self.inner.__exit__(*a)

    svcmod.query_class = lambda s, cls, timeout=None: Probe(orig(s, cls, timeout), cls)
    try:
        pages = svc.select_edges_batch(
            [
                EdgeQuery(Term(1, 1, True)),
                EdgeQuery(Term(1, 2, True), destination_ids=(11, 12)),
            ]
        )
    finally:
        svcmod.query_class = orig
    assert len(pages) == 2 and pages[0].rows and pages[1].rows
    # the WhereIn member drags the whole batch into the SMALL intersection class
    assert seen == [("select_intersection_small", "flock_select_intersection_small")]

    seen.clear()
    svcmod.query_class = lambda s, cls, timeout=None: Probe(orig(s, cls, timeout), cls)
    try:
        svc.select_edges_batch([EdgeQuery(Term(1, 1, True))])
    finally:
        svcmod.query_class = orig
    assert seen == [("select", "flock_select")]


def test_pool_isolation_under_concurrency(svc, spark):
    """VERDICT r7 item 6: with FAIR scheduling + per-class pools, a slow
    copy-class action on one thread does NOT head-of-line-block a
    select-class action on another — the per-class evaluator isolation the
    reference's production config guarantees (config/production.scala:26-35).

    The copy job runs many waves of short tasks (256 partitions × ~80 ms on
    32 cores ≈ 8 waves); under FIFO the select would queue behind ALL
    pending copy tasks, under FAIR it gets slots at the next wave."""
    import threading
    import time as _t

    from pyspark.sql import functions as F

    from flockdb_spark.operators.classes import QueryClass, query_class

    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"

    slow_done = {}
    # thread A: a copy-class scan occupying every core for several waves
    def copy_job():
        slow = spark.range(0, 256, 1, 256).mapInPandas(
            lambda it: (_t.sleep(0.08) or pdf for pdf in it), "id long"
        )
        t0 = _t.monotonic()
        with query_class(spark, QueryClass.SELECT_COPY):
            n = slow.count()
        slow_done["wall"] = _t.monotonic() - t0
        slow_done["n"] = n

    a = threading.Thread(target=copy_job)
    a.start()
    _t.sleep(0.15)  # let the copy job saturate the cores first

    # thread B (this thread): a select-class point read while A is running
    t0 = _t.monotonic()
    row = svc.get(1, 1, 10)
    select_wall = _t.monotonic() - t0
    assert row is not None and a.is_alive(), "copy job must still be running"
    a.join()
    assert slow_done["n"] == 256
    # the select must NOT have waited for the copy job's full runtime —
    # generous bound: under FIFO it lands ~= slow wall, under FAIR far below
    assert select_wall < slow_done["wall"] * 0.7, (select_wall, slow_done)
