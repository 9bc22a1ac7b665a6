from .curation import curation_gates, stream_curated_corpus
from .ingest import EdgeStreamIngestor, stream_writes

__all__ = ["EdgeStreamIngestor", "stream_writes", "curation_gates", "stream_curated_corpus"]
