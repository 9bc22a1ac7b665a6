"""Multimodal columns: image/audio/video as opaque binary with typed metadata.

The container has no image/audio libraries, so the decode step is a
deterministic STUB (clearly marked) — but the Spark-side plumbing is real:
binary columns, Arrow-batched ``mapInPandas`` with an explicit output schema,
and batch-shaped processing exactly as a real decoder (PIL/ffmpeg behind the
same signature) would run on a cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("frames", T.LongType()),
    ]
)


def attach_blobs(docs: DataFrame) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media blob (the stand-in
    for real image/audio payload parquet columns)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("blob"),
    )


def real_decode(blob: bytes) -> tuple[int, int, int]:
    """The true decoder — requires PIL/ffmpeg, absent in this container."""
    raise NotImplementedError("media decoding requires image/audio libs not in this container")


def _stub_decode(blob: bytes) -> tuple[int, int, int]:
    """STUB decode: deterministic fake dimensions derived from byte length.
    Replace with ``real_decode`` where the libs exist — the Spark plumbing
    (schema, batching, partitioning) is identical."""
    n = len(blob)
    return ((n % 64 + 1) * 16, (n % 48 + 1) * 16, n % 7 + 1)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs via mapInPandas —
    the pattern for any per-item decode at scale: executors stream record
    batches, Python touches each blob once, output schema is explicit."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            dims = pdf["blob"].map(_stub_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["blob"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "frames": dims.map(lambda d: d[2]).astype("int64"),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)
