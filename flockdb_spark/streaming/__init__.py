from .ingest import EdgeStreamIngestor, stream_writes

__all__ = ["EdgeStreamIngestor", "stream_writes"]
