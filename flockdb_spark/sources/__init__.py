from .tables import TABLE_NAMES, load_tables, register_views
from .edges import build_edges, build_metadata, EDGES_CTE_SQL, METADATA_CTE_SQL, with_fixture_ctes

__all__ = [
    "TABLE_NAMES",
    "load_tables",
    "register_views",
    "build_edges",
    "build_metadata",
    "EDGES_CTE_SQL",
    "METADATA_CTE_SQL",
    "with_fixture_ctes",
]
