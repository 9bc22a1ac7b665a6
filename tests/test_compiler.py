"""RPN select-compiler validation and execute compilation — mirrors
``unit/SelectCompilerSpec.scala:55-156`` and ``unit/ExecuteCompilerSpec.scala``.
"""

import pytest

from flockdb_spark.operators.algebra import Difference, Intersection, Simple, Union, WhereIn
from flockdb_spark.plans.compiler import (
    ExecuteOperation,
    ExecuteOperationType,
    InvalidQueryError,
    QueryTerm,
    SelectOperation,
    SelectOperationType,
    compile_execute,
    compile_select,
)


def term_op(src=1, graph=1, fwd=True, dests=None, states=(0,)):
    return SelectOperation(
        SelectOperationType.SIMPLE_QUERY, QueryTerm(src, graph, fwd, dests, states)
    )


def test_single_term():
    node = compile_select([term_op()])
    assert isinstance(node, Simple) and node.term.source_id == 1


def test_where_in_term():
    node = compile_select([term_op(dests=(5, 6))])
    assert isinstance(node, WhereIn) and node.in_ids == (5, 6)


def test_nested_tree():
    # (1 ∩ 2) ∪ 3 in RPN, like SelectCompilerSpec.scala:112-128
    prog = [
        term_op(1),
        term_op(2),
        SelectOperation(SelectOperationType.INTERSECTION),
        term_op(3),
        SelectOperation(SelectOperationType.UNION),
    ]
    node = compile_select(prog)
    assert isinstance(node, Union) and isinstance(node.left, Intersection)
    assert node.depth() == 3


def test_difference_operand_order():
    prog = [term_op(1), term_op(2), SelectOperation(SelectOperationType.DIFFERENCE)]
    node = compile_select(prog)
    assert isinstance(node, Difference)
    assert node.left.term.source_id == 1 and node.right.term.source_id == 2


@pytest.mark.parametrize(
    "prog",
    [
        [],  # empty program (SelectCompiler.scala:49-50)
        [SelectOperation(SelectOperationType.INTERSECTION)],  # op without operands
        [term_op(), term_op()],  # leftover operands (:30-42)
        [term_op(), term_op(), term_op(), SelectOperation(SelectOperationType.UNION)],
    ],
)
def test_invalid_programs(prog):
    with pytest.raises(InvalidQueryError):
        compile_select(prog)


def test_execute_forward(spark):
    ops = [
        ExecuteOperation(
            ExecuteOperationType.ADD, QueryTerm(1, 1, True, (10, 11)), position=7
        )
    ]
    rows = compile_execute(spark, ops, now=1000).collect()
    assert {(r["source_id"], r["destination_id"]) for r in rows} == {(1, 10), (1, 11)}
    assert all(r["op_state"] == 0 and r["updated_at"] == 1000 for r in rows)


def test_execute_backward_swaps(spark):
    # backward terms swap src/dest (ExecuteCompiler.scala:88-94)
    ops = [ExecuteOperation(ExecuteOperationType.REMOVE, QueryTerm(1, 1, False, (10,)))]
    r = compile_execute(spark, ops, now=1000).collect()[0]
    assert (r["source_id"], r["destination_id"]) == (10, 1) and r["op_state"] == 1


def test_execute_wildcard_is_mass_action(spark):
    ops = [ExecuteOperation(ExecuteOperationType.ARCHIVE, QueryTerm(5, 2, True, None))]
    r = compile_execute(spark, ops, now=1000).collect()[0]
    assert r["destination_id"] is None and r["op_state"] == 2 and r["source_id"] == 5
