"""Similarity search over an embedding column (array<float>).

Engine-portability trick used throughout: embeddings are quantized to integer
micro-units (round(x*1e6) as int64) BEFORE any arithmetic.  Integer dot
products are exact and order-independent, so Spark's partially-aggregated sums
and any oracle agree bit-for-bit — float reductions would not.  At 1e6 scale a
64-dim unit vector's dot fits comfortably in int64 (≤ 6.4e13).

- brute-force cosine top-k: the correctness baseline (embeddings here are
  unit-norm, so dot == cosine)
- LSH-bucketed ANN: random-hyperplane signatures from deterministic
  hash-derived hyperplanes; bucket join replaces the cross product — the
  100 TB path
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def quantized(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * MICRO).cast("long"))


def dot_q(a, b) -> F.Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-k cosine neighbors for each query id — broadcast the (tiny) query
    side against the full corpus, rank with a per-query window.

    Output: (query_id, neighbor_id, dot_micro2, rank); dot is in micro²-units
    (divide by 1e12 for the cosine value)."""
    from pyspark.sql import Window

    q = (
        emb.where(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(F.col(id_col).alias("query_id"), quantized(vec_col).alias("qv"))
    )
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), quantized(vec_col).alias("ev"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot_q(F.col("qv"), F.col("ev")).alias("dot_micro2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_micro2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def neardup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) —
    exact quadratic baseline; LSH below is the scale variant."""
    a = emb.select(F.col(id_col).alias("a"), quantized(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("b"), quantized(vec_col).alias("vb"))
    thresh = int(threshold * MICRO * MICRO)
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", dot_q(F.col("va"), F.col("vb")).alias("dot_micro2"))
        .where(F.col("dot_micro2") >= thresh)
    )


def hyperplane_signature(vec_col, dims: int, planes: int = 16) -> F.Column:
    """Random-hyperplane LSH signature: bit p = sign(v · h_p) where h_p's
    components are deterministic ±1s derived from xxhash64(p, dim-index).
    Pure column expressions — the hyperplanes are never materialized."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def plane_sign(p: int):
        # closure (not a default arg: pyspark counts lambda params strictly)
        return lambda x, i: F.when(
            F.pmod(F.xxhash64(F.lit(p), i), F.lit(2)) == 0, x
        ).otherwise(-x)

    bits = []
    for p in range(planes):
        signed = F.zip_with(v, F.sequence(F.lit(0), F.lit(dims - 1)), plane_sign(p))
        s = F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)
        bits.append(F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = 12,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: exact ranking restricted to the query's LSH bucket.

    At corpus scale the bucket join touches ~corpus/2^planes rows per query
    instead of the full table; recall is tunable via ``planes`` (and
    multi-probe, not implemented here)."""
    from pyspark.sql import Window

    sig = emb.select(
        F.col(id_col).alias("neighbor_id"),
        quantized(vec_col).alias("ev"),
        hyperplane_signature(quantized(vec_col), dims, planes).alias("bucket"),
    )
    q = (
        sig.where(F.col("neighbor_id").isin([int(i) for i in query_ids]))
        .select(
            F.col("neighbor_id").alias("query_id"),
            F.col("ev").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        sig.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dot_q(F.col("qv"), F.col("ev")).alias("dot_micro2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_micro2"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).where(F.col("rank") <= k)
