"""Streaming corpus curation: the batch pipeline's gate stages as a
Structured Streaming flow.

The x19 batch pipeline's first stages (language gate → quality gate) are
stateless per-row projections/filters, so the SAME column expressions run
unchanged under ``readStream`` — no state store, no watermark, any
source/sink.  What does NOT stream statelessly is exact dedup and the token
budget (corpus-global decisions); the streaming pipeline therefore gates
eagerly at ingest and leaves dedup to either the watermark-bounded
streaming dedup (``streaming/dedup.py``, bounded state) or the batch pass.

That split mirrors the reference's architecture: cheap per-item work on the
write path, global reconciliation as async jobs (``doc/blog.md:110-119``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import LANG_MARKERS, tokens, _count_in


def curation_gates(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    min_distinct_micro: int = 300_000,
    lang_markers: tuple[str, ...] = LANG_MARKERS["en"],
    min_lang_hits: int = 1,
) -> DataFrame:
    """Language + quality gates as pure projections — batch/stream agnostic.

    Exactly x19's gate semantics: keep documents with ≥ ``min_lang_hits``
    marker-stopword hits, token count within bounds, and a distinct-token
    ratio of at least ``min_distinct_micro`` (integer micros, portable).
    Staged selects materialize the token array once per row.

    Output: (doc_id, text, n_tokens).
    """
    w = F.col("_w")
    staged = docs.select("doc_id", "text", tokens("text").alias("_w")).select(
        "doc_id",
        "text",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("_nd"),
        _count_in(w, lang_markers).cast("long").alias("_hits"),
    )
    return (
        staged.where(F.col("_hits") >= min_lang_hits)
        .where(F.col("n_tokens").between(min_tokens, max_tokens))
        .where(
            F.expr("_nd * 1000000 div n_tokens") >= min_distinct_micro
        )
        .select("doc_id", "text", "n_tokens")
    )


def stream_curated_corpus(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **gate_kwargs,
):
    """End-to-end streaming curation: JSONL landing zone → gates → parquet.

    File source with a pinned schema (new files picked up per micro-batch —
    the object-store landing-zone pattern), curation gates inline, parquet
    sink with checkpointed exactly-once file commits.  ``availableNow``
    drains the backlog and stops — the batch-refresh deployment mode; leave
    it False for a continuously tailing ingest.

    Returns the started ``StreamingQuery``.
    """
    from ..sources.corpus import DOCUMENT_SCHEMA

    raw = spark.readStream.schema(DOCUMENT_SCHEMA).json(source_path)
    gated = curation_gates(raw, **gate_kwargs)
    writer = (
        gated.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_decontaminated_corpus(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_dir: str,
    eval_docs: DataFrame,
    fuzzy: bool = True,
    trigger_available_now: bool = True,
    **decon_kwargs,
):
    """Ingest-time benchmark decontamination: JSONL landing zone → leakage
    gate against a PINNED eval set → parquet of clean docs only.

    A document's contamination verdict depends only on the document itself
    and the (static, broadcast-sized) eval set — never on other corpus rows
    — so the batch operators (``dedup.decontaminate`` /
    ``dedup.fuzzy_decontaminate``) apply per micro-batch via ``foreachBatch``
    with EXACTLY the batch semantics; stream output == batch output by
    construction (pinned by test).  foreachBatch rather than a stateless
    projection because the operators aggregate per-doc shingle/signature
    rows — an aggregation within the batch, not across batches, which is
    precisely the case the Structured Streaming guide routes through
    foreachBatch.

    Returns the started ``StreamingQuery``.
    """
    from ..functions import dedup
    from ..sources.corpus import DOCUMENT_SCHEMA

    gate = dedup.fuzzy_decontaminate if fuzzy else dedup.decontaminate

    def process(batch_df, batch_id):
        if not batch_df.take(1):
            return
        verdicts = gate(batch_df, eval_docs, **decon_kwargs)
        clean = batch_df.join(
            verdicts.where(F.col("is_contaminated") == 0).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        clean.write.mode("append").parquet(sink_path)

    raw = spark.readStream.schema(DOCUMENT_SCHEMA).json(source_path)
    writer = raw.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
