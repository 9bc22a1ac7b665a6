"""flockdb_spark — a PySpark-native engine with the query and data-processing
capabilities of twitter-archive/flockdb (reference at /root/reference, cited by
file:line in docstrings), plus LLM-data-pipeline operators.

Everything is expressed as DataFrame transformations so Catalyst/Tungsten pick
the physical strategy; custom logic is limited to keyset pagination, the
temporal last-writer-wins merge, the count2 estimator, and the RPN compiler.

Typical use::

    from flockdb_spark import EdgeStore, FlockService, get_spark

    spark = get_spark()
    store = EdgeStore.read_optimized(spark, "/data/edges")
    svc = FlockService(store)
    page = svc.select_edges(source_id=42, graph_id=1, count=20)
"""

from .graph import EdgeStore
from .schema import EDGE_SCHEMA, METADATA_SCHEMA, State, ordered_uuid_position
from .service import FlockService, SelectQuery
from .session import get_spark

__all__ = [
    "EDGE_SCHEMA",
    "METADATA_SCHEMA",
    "State",
    "ordered_uuid_position",
    "EdgeStore",
    "FlockService",
    "SelectQuery",
    "get_spark",
]
__version__ = "0.1.0"
