"""RPN program compilers — the reference's wire-level query IR.

``select2`` ships a postfix (RPN) program of SelectOperations: term literals
push leaf queries, binary ops pop two and push a compound node
(``queries/SelectCompiler.scala:44-77``; stack validation ``:30-42,49-50``).
``execute`` ships a flat list of ExecuteOperations compiled to write jobs
(``queries/ExecuteCompiler.scala:32-99``).

Here both compile to declarative artifacts: a ``QueryNode`` tree (→ Catalyst
plan) and a writes DataFrame (→ W2 merge).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.algebra import Difference, Intersection, QueryNode, Simple, Term, Union, WhereIn
from ..schema import State, local_df


class InvalidQueryError(ValueError):
    """Raised for malformed RPN programs (SelectCompiler.scala:30-42)."""


class SelectOperationType(enum.IntEnum):
    # Flockdb.thrift:78-83
    SIMPLE_QUERY = 0
    INTERSECTION = 1
    UNION = 2
    DIFFERENCE = 3


@dataclass(frozen=True)
class QueryTerm:
    """Wire-level term (Flockdb.thrift:71-76)."""

    source_id: int
    graph_id: int
    is_forward: bool = True
    destination_ids: tuple[int, ...] | None = None
    states: tuple[int, ...] = (int(State.NORMAL),)


@dataclass(frozen=True)
class SelectOperation:
    operation_type: SelectOperationType
    term: QueryTerm | None = None


def compile_select(program: list[SelectOperation]) -> QueryNode:
    """RPN → QueryNode tree, with the reference's validation errors
    (``SelectCompiler.scala:44-77``)."""
    if not program:
        raise InvalidQueryError("program must not be empty")
    stack: list[QueryNode] = []
    for op in program:
        if op.operation_type == SelectOperationType.SIMPLE_QUERY:
            if op.term is None:
                raise InvalidQueryError("simple query operation requires a term")
            t = op.term
            term = Term(
                graph_id=t.graph_id,
                source_id=t.source_id,
                forward=t.is_forward,
                states=tuple(t.states),
            )
            if t.destination_ids is not None:
                stack.append(WhereIn(term, tuple(t.destination_ids)))
            else:
                stack.append(Simple(term))
        else:
            if len(stack) < 2:
                raise InvalidQueryError("binary operation needs two operands on the stack")
            right = stack.pop()
            left = stack.pop()
            node_cls = {
                SelectOperationType.INTERSECTION: Intersection,
                SelectOperationType.UNION: Union,
                SelectOperationType.DIFFERENCE: Difference,
            }[op.operation_type]
            stack.append(node_cls(left, right))
    if len(stack) != 1:
        raise InvalidQueryError(f"program left {len(stack)} operands on the stack")
    return stack[0]


class ExecuteOperationType(enum.IntEnum):
    # Flockdb.thrift:103-108; preferred edge state per op
    ADD = 0
    REMOVE = 1
    ARCHIVE = 2
    NEGATE = 3


@dataclass(frozen=True)
class ExecuteOperation:
    operation_type: ExecuteOperationType
    term: QueryTerm
    position: int | None = None
    execute_at: int | None = None  # epoch seconds; defaults to now


_OP_STATE = {
    ExecuteOperationType.ADD: int(State.NORMAL),
    ExecuteOperationType.REMOVE: int(State.REMOVED),
    ExecuteOperationType.ARCHIVE: int(State.ARCHIVED),
    ExecuteOperationType.NEGATE: int(State.NEGATIVE),
}


def compile_execute(
    spark: SparkSession, program: list[ExecuteOperation], now: int
) -> DataFrame:
    """ExecuteOperations → op-log DataFrame for ``apply_oplog``.

    Backward terms with explicit destinations swap source/destination
    (``ExecuteCompiler.scala:88-94``), so single-edge rows are always stored
    forward and their ``is_forward`` is True.  A term without destination_ids
    is a wildcard mass-action row (``:86-99``) and KEEPS its direction: the
    reference's Multi honors ``Direction(term.isForward)``
    (``jobs/multi/Multi.scala:102-126``), so a backward mass op must apply to
    the edges INTO the vertex — ``apply_oplog`` expands it against
    ``destination_id == vertex``.  Position defaults to now-millis<<20 per
    the ordered-uuid scheme (``UuidGenerator.scala:26-39``).
    """
    rows: list[tuple] = []
    for op in program:
        t = op.term
        ts = op.execute_at if op.execute_at is not None else now
        default_pos = (ts * 1000) << 20
        if t.destination_ids is None:
            src = t.source_id  # mass-action on the vertex itself
            rows.append(
                (_OP_STATE[op.operation_type], t.graph_id, src, None, 0, ts, t.is_forward)
            )
        else:
            for dest in t.destination_ids:
                s, d = (t.source_id, dest) if t.is_forward else (dest, t.source_id)
                pos = op.position if op.position is not None else default_pos | (d % (1 << 20))
                rows.append((_OP_STATE[op.operation_type], t.graph_id, s, d, pos, ts, True))
    # the is_forward column is only emitted when a backward wildcard exists —
    # its presence is what tells apply_oplog to build the backward-expansion
    # branch, so the common all-forward batch keeps the lean plan
    if any(r[3] is None and not r[6] for r in rows):
        return local_df(
            spark,
            rows,
            "op_state int, graph_id int, source_id long, destination_id long, "
            "position long, updated_at long, is_forward boolean",
        )
    return local_df(
        spark,
        [r[:6] for r in rows],
        "op_state int, graph_id int, source_id long, destination_id long, "
        "position long, updated_at long",
    )
