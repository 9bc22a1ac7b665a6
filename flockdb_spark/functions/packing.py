"""Token-budget sequence packing: assign every document a position in the
concatenated token stream of the corpus, chunked into fixed-size training
sequences — the final layout step of a pretraining data pipeline ("concat
and chunk every ``budget`` tokens").

The global prefix sum is computed the scalable way: a parallel per-shard
cumulative sum (window partitioned by a hash shard of the id) plus a tiny
broadcast table of per-shard base offsets.  No single-partition global
window — the only full-table shuffle is the one hash partition on the shard
key, so the plan survives a 100 TB corpus (shard count is a parameter;
raise it so each shard's window sort fits in executor memory).

Document order inside the stream is ``(shard, doc_id)`` — deterministic,
engine-portable, and reproducible on any partitioning of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> DataFrame:
    """For each document: its token count, the global token offset where it
    starts (``cum_before``), and the training sequence it starts in
    (``seq_id = cum_before // budget``, ``seq_offset = cum_before % budget``).

    Documents straddle sequence boundaries exactly as in concat-then-chunk
    pretraining; downstream writers slice on ``seq_id``/``seq_offset``.
    """
    # No cache (r11): the old shape cached the tokenized projection to share
    # it between the shard-totals aggregate and the per-shard window, paying
    # a cache materialization pass + storage-memory pressure.  Tokenizing
    # (one split()) is cheaper than materializing: the totals branch
    # re-derives it map-side and its partial aggregation shuffles only
    # ~n_shards rows per mapper (the corpus-sized bytes cross exactly one
    # exchange — the window's); guide §2.3 "aggregate before you shuffle".
    d = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
    )
    totals = d.groupBy("shard").agg(F.sum("n_tokens").alias("shard_tokens"))
    # n_shards rows: the single-partition window here is over a tiny dim table
    w_base = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    base = totals.select(
        "shard", F.coalesce(F.sum("shard_tokens").over(w_base), F.lit(0)).alias("base")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("base")
    return (
        d.join(F.broadcast(base), "shard")
        .withColumn("cum_before", cum)
        .select(
            "doc_id",
            "n_tokens",
            "cum_before",
            F.floor(F.col("cum_before") / budget).cast("long").alias("seq_id"),
            (F.col("cum_before") % budget).alias("seq_offset"),
        )
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    chunk: int = 1 << 20,
    inclusive: bool = True,
) -> DataFrame:
    """Distributed running total of ``value_col`` in global ``order_col``
    order — the scalable replacement for ``sum().over(Window.orderBy(...))``,
    which funnels the whole table through one partition.

    Shards are contiguous id ranges (``order_col div chunk``), so
    (shard asc, order asc) IS the global order: a per-shard window prefix sum
    plus a broadcast of per-shard base offsets reconstructs the exact global
    running total with one hash shuffle on the shard key.  The only
    single-partition work is the base-offset window over ``id_range/chunk``
    rows (tiny; for truly unbounded id ranges apply the same trick to the
    totals table recursively).  ``order_col`` must be unique per row for the
    result to be deterministic.
    """
    # Integer `div`, not floor(x/chunk): float division is exact only below
    # 2^53 and this repo's position scheme is millis<<20 (~2^60), where a
    # rounded quotient can land a boundary row in the wrong shard and corrupt
    # the global running total (same overflow-safe style as splits.split_bucket).
    d = df.withColumn("_shard", F.expr(f"`{order_col}` div {int(chunk)}"))
    totals = d.groupBy("_shard").agg(F.sum(value_col).alias("_st"))
    w_base = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    base = totals.select(
        "_shard", F.coalesce(F.sum("_st").over(w_base), F.lit(0)).alias("_base")
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    cum = F.coalesce(F.sum(value_col).over(w), F.lit(0)) + F.col("_base")
    return (
        d.join(F.broadcast(base), "_shard")
        .withColumn(out_col, cum)
        .drop("_shard", "_base")
    )


def pack_sequences_sql(
    budget: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 32,
) -> str:
    """DuckDB twin of :func:`pack_sequences`: one global window in
    ``(shard, doc_id)`` order — semantically identical to the sharded
    prefix sum."""
    w = f"string_split({text_col}, ' ')"
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, CAST(length({w}) AS BIGINT) AS n_tokens,
         {id_col} % {n_shards} AS shard
  FROM {table}
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY shard, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM d
)
SELECT doc_id, n_tokens, cum_before,
       cum_before // {budget} AS seq_id,
       cum_before % {budget} AS seq_offset
FROM c
"""
