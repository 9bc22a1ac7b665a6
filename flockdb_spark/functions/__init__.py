from . import (
    analytics,
    dedup,
    multimodal,
    packing,
    relevance,
    semistructured,
    similarity,
    splits,
    stats,
    text,
)

__all__ = [
    "analytics",
    "dedup",
    "multimodal",
    "packing",
    "relevance",
    "semistructured",
    "similarity",
    "splits",
    "stats",
    "text",
]
