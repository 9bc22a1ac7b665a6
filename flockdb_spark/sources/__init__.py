from .tables import TABLE_NAMES, load_tables, register_views
from .edges import build_edges, build_metadata, EDGES_CTE_SQL, METADATA_CTE_SQL, with_fixture_ctes
from .corpus import (
    DOCUMENT_SCHEMA,
    read_curated,
    read_documents_jsonl,
    write_curated,
    write_documents_jsonl,
)

__all__ = [
    "TABLE_NAMES",
    "load_tables",
    "register_views",
    "build_edges",
    "build_metadata",
    "EDGES_CTE_SQL",
    "METADATA_CTE_SQL",
    "with_fixture_ctes",
    "DOCUMENT_SCHEMA",
    "read_curated",
    "read_documents_jsonl",
    "write_curated",
    "write_documents_jsonl",
]
