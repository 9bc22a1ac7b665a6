from .compiler import (
    SelectOperation,
    SelectOperationType,
    ExecuteOperation,
    ExecuteOperationType,
    compile_select,
    compile_execute,
    InvalidQueryError,
)

__all__ = [
    "SelectOperation",
    "SelectOperationType",
    "ExecuteOperation",
    "ExecuteOperationType",
    "compile_select",
    "compile_execute",
    "InvalidQueryError",
]
