"""flockdb_spark — a PySpark-native engine with the query and data-processing
capabilities of twitter-archive/flockdb (reference at /root/reference, cited by
file:line in docstrings), plus LLM-data-pipeline operators.

Everything is expressed as DataFrame transformations so Catalyst/Tungsten pick
the physical strategy; custom logic is limited to keyset pagination, the
temporal last-writer-wins merge, the count2 estimator, and the RPN compiler.
"""

from .schema import EDGE_SCHEMA, METADATA_SCHEMA, State

__all__ = ["EDGE_SCHEMA", "METADATA_SCHEMA", "State"]
__version__ = "0.1.0"
