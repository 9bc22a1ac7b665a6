from . import text, dedup, similarity, multimodal, analytics

__all__ = ["text", "dedup", "similarity", "multimodal", "analytics"]
