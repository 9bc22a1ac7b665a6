from .paging import Cursor, Page, paginate, CURSOR_START, CURSOR_END
from .merge import temporal_merge, resolve_writes, apply_oplog, metadata_merge, derive_metadata
from .algebra import Term, Simple, WhereIn, Intersection, Union, Difference, QueryNode
from .counts import size_estimate
from .reconcile import reconcile

__all__ = [
    "Cursor",
    "Page",
    "paginate",
    "CURSOR_START",
    "CURSOR_END",
    "temporal_merge",
    "resolve_writes",
    "apply_oplog",
    "metadata_merge",
    "derive_metadata",
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
