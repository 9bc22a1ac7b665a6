from .paging import Cursor, Page, paginate, CURSOR_START, CURSOR_END
from .merge import (
    temporal_merge,
    sequenced_merge,
    resolve_writes,
    apply_oplog,
    metadata_merge,
    derive_metadata,
)
from .algebra import Term, Simple, WhereIn, Intersection, Union, Difference, QueryNode
from .counts import size_estimate
from .reconcile import reconcile
from .skew import salted_join

__all__ = [
    "Cursor",
    "Page",
    "paginate",
    "CURSOR_START",
    "CURSOR_END",
    "temporal_merge",
    "sequenced_merge",
    "resolve_writes",
    "apply_oplog",
    "metadata_merge",
    "derive_metadata",
    "salted_join",
    "Term",
    "Simple",
    "WhereIn",
    "Intersection",
    "Union",
    "Difference",
    "QueryNode",
    "size_estimate",
    "reconcile",
]
