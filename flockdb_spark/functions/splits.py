"""Deterministic train/validation/test splitting — the last step of every
training-data pipeline: every row must land in exactly one split, the
assignment must be stable across runs/engines/cluster sizes, and joining any
derived table back must never straddle splits.

The bucket hash is a multiplicative-congruential scramble of the id in pure
64-bit integer arithmetic (Knuth's 2654435761 multiplier mod the Mersenne-ish
prime 1e9+7), chosen because it is expressible identically in any SQL engine
— that is what makes the DuckDB oracle byte-exact.  On a real 100 TB run the
same shape works with ``xxhash64(id, seed)`` for better avalanche; swap one
expression.  Narrow transform, no shuffle: the split column is computed
map-side at scan time and acts as a partition-pruning column once written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import local_df

HASH_MULT = 2654435761
HASH_MOD = 1_000_000_007
N_BUCKETS = 1000


def split_bucket(id_col: Column | str) -> Column:
    """Stable bucket in [0, 1000) from an integer id.

    The id is reduced mod ``HASH_MOD`` BEFORE the multiply: ``(id mod M) * MULT
    < 2^63`` always, so the expression never overflows int64 — ids beyond
    ~3.49e9 (billions-of-docs scale) would otherwise wrap in non-ANSI Spark
    and error in DuckDB/ANSI mode.  Mathematically identical to multiplying
    first: (a*b) mod M == ((a mod M)*b) mod M."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    reduced = F.pmod(c.cast("long"), F.lit(HASH_MOD))
    return F.pmod(F.pmod(reduced * F.lit(HASH_MULT), F.lit(HASH_MOD)), F.lit(N_BUCKETS))


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    train_per_mille: int = 800,
    val_per_mille: int = 100,
) -> DataFrame:
    """Adds (bucket, split) columns: train/val/test by per-mille bucket
    ranges (default 80/10/10)."""
    b = split_bucket(id_col)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_per_mille, "train")
        .when(F.col("bucket") < train_per_mille + val_per_mille, "val")
        .otherwise("test"),
    )


def split_bucket_sql(id_col: str) -> str:
    """DuckDB twin of ``split_bucket`` (all operands positive, so ``%`` and
    ``pmod`` agree; same reduce-before-multiply overflow guard)."""
    return (
        f"(((CAST({id_col} AS BIGINT) % {HASH_MOD}) * {HASH_MULT})"
        f" % {HASH_MOD}) % {N_BUCKETS}"
    )


def stratified_sample(
    df: DataFrame,
    rates_per_mille: dict[str, int],
    default_per_mille: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic stratified sampling: keep a per-stratum fraction of rows,
    chosen by the portable id hash — the curation step that rebalances a
    corpus (e.g. downsample dominant languages) reproducibly.

    The rates are a broadcast dimension joined on the stratum, so the plan is
    scan → broadcast-hash-join → filter: zero shuffles of the fact table, and
    the same rows survive on any cluster size or engine.  ``sampleBy`` is the
    built-in alternative but is seeded-random, not content-deterministic —
    re-running on re-partitioned data would sample different rows.
    """
    spark = df.sparkSession
    rates = local_df(
        spark, list(rates_per_mille.items()), f"{strata_col} string, keep_per_mille int"
    )
    return (
        df.withColumn("bucket", split_bucket(id_col))
        .join(F.broadcast(rates), strata_col, "left")
        .withColumn(
            "keep_per_mille",
            F.coalesce("keep_per_mille", F.lit(default_per_mille)),
        )
        .where(F.col("bucket") < F.col("keep_per_mille"))
    )


def stratified_sample_sql(
    table: str,
    rates_per_mille: dict[str, int],
    default_per_mille: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in rates_per_mille.items()
    )
    bucket = split_bucket_sql(id_col)
    return (
        f"SELECT {select} FROM ("
        f"SELECT *, CAST({bucket} AS BIGINT) AS bucket, "
        f"CAST(CASE {strata_col} {whens} ELSE {default_per_mille} END AS INT) AS keep_per_mille "
        f"FROM {table}) WHERE bucket < keep_per_mille"
    )


def mixture_upsample(
    docs: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-mixing epoch upsampling: replicate each document ``weights[source]``
    times (an integer epoch count per source), emitting an ``epoch`` column —
    the standard way a training mix oversamples high-quality sources
    (weights come from the mixing recipe, e.g. wiki×3, web×1).

    Plan shape: the weight table is a literal map baked into the projection
    (no join — sources are a handful of names), and the replication is a
    generator (explode of a 0..w-1 sequence) that runs map-side with NO
    shuffle: output partitioning follows the input.  Sources absent from
    ``weights`` default to weight 1 (kept once).

    Output: (doc_id, source, epoch) with epoch in [0, w).
    """
    w = F.lit(1)
    for name, k in sorted(weights.items()):
        w = F.when(F.col(source_col) == name, F.lit(int(k))).otherwise(w)
    # sequence(0, w-1) with w <= 0 generates a DESCENDING sequence [0, -1, ...]
    # instead of an empty one, so a weight-0 source would be kept (twice) rather
    # than dropped; guard it the same way dedup.word_shingles guards shingling.
    epochs = F.when(w > 0, F.sequence(F.lit(0), w - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
        .withColumn("epoch", F.explode(epochs))
        .select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))
    )


def mixture_upsample_sql(weights: dict[str, int]) -> str:
    """DuckDB twin of :func:`mixture_upsample` over ``documents``."""
    case = "CASE " + " ".join(
        f"WHEN source = '{k}' THEN {int(v)}" for k, v in sorted(weights.items())
    ) + " ELSE 1 END"
    return f"""
SELECT doc_id, source, CAST(unnest(range({case})) AS BIGINT) AS epoch
FROM documents
"""


def order_scramble(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic pseudo-random sort key for training order: the same
    overflow-safe multiplicative scramble as ``split_bucket``, seeded.
    Expressible identically in any engine (``order_scramble_sql``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    reduced = F.pmod(c.cast("long") + F.lit(seed * 7919), F.lit(HASH_MOD))
    return F.pmod(reduced * F.lit(HASH_MULT), F.lit(HASH_MOD))


def training_order(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8, seed: int = 0
) -> DataFrame:
    """Global pseudo-shuffle for training-order assignment: every row gets a
    (shard, pos) such that reading shard files round-robin yields a
    deterministic, well-mixed order — the stage that replaces ``ORDER BY
    random()`` (a full global sort with an unreproducible result) in a
    corpus-to-trainer handoff.

    Shape at 100 TB: one hash shuffle on the shard key, then shard-LOCAL
    rank windows (no global ordering, no single-partition exchange); shards
    are written as independent files and consumed in (pos, shard) order.
    Re-running on any cluster size reproduces the identical order.

    Output: (id, shard, pos) — pos is 0-based within the shard.
    """
    from pyspark.sql import Window

    h = order_scramble(id_col, seed)
    w = Window.partitionBy("shard").orderBy("ord", id_col)
    return (
        df.select(F.col(id_col), h.alias("ord"))
        .withColumn("shard", F.pmod(F.col("ord"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def order_scramble_sql(id_col: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`order_scramble`."""
    return (
        f"(((CAST({id_col} AS BIGINT) + {seed * 7919}) % {HASH_MOD})"
        f" * {HASH_MULT}) % {HASH_MOD}"
    )


def training_order_sql(
    table: str = "documents", id_col: str = "doc_id", n_shards: int = 8, seed: int = 0
) -> str:
    """DuckDB twin of :func:`training_order`."""
    h = order_scramble_sql(id_col, seed)
    return f"""
WITH h AS (SELECT {id_col}, {h} AS ord FROM {table}),
s AS (SELECT {id_col}, ord, CAST(ord % {n_shards} AS INTEGER) AS shard FROM h)
SELECT {id_col}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, {id_col}) - 1 AS BIGINT) AS pos
FROM s
""".strip()


def temperature_sample(
    docs: DataFrame,
    target_per_mille: int = 500,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-rebalanced corpus sampling (α = 1/2): the standard
    data-mixing move that flattens a skewed source distribution — each
    source's share of the sampled corpus is ∝ √n_s instead of ∝ n_s, so
    dominant sources are downsampled hardest and small sources keep most
    of their rows (the multilingual-sampling recipe of GPT/XLM-style mixes,
    applied to sources).

    Entirely integer/portable arithmetic so the DuckDB twin is byte-exact:
    weights w_s = isqrt(n_s) (floor of the IEEE sqrt — exact for any
    realistic count), per-source quota q_s = T·w_s / Σw with
    T = total·target_per_mille/1000, keep rate r_s = min(1000, 1000·q_s/n_s)
    per mille, and the row-level keep decision is the same content-hash
    bucket as every sampler here (``split_bucket(id) < r_s``) — stable
    across engines, runs, and cluster sizes.

    Plan shape: one tiny per-source count aggregation, a 1-row total
    cross-joined onto it (both driver-sized), then ONE broadcast join of the
    rate table back onto the corpus and a map-side filter — the fact table
    never shuffles.  Downsample-only by design (rates cap at 1000); epoch
    upsampling composes via ``mixture_upsample``.

    Output: kept rows (id, source, bucket, keep_per_mille).
    """
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    counts = counts.withColumn("w", F.floor(F.sqrt(F.col("n_docs"))).cast("long"))
    totals = counts.agg(
        F.sum("n_docs").alias("_total"), F.sum("w").alias("_sumw")
    )
    rates = (
        counts.crossJoin(F.broadcast(totals))
        # pure int64 arithmetic (`div`), matching the SQL twin's `//` exactly
        .withColumn(
            "_quota",
            F.expr(
                f"((_total * {int(target_per_mille)}) div 1000) * w div _sumw"
            ),
        )
        .withColumn(
            "keep_per_mille",
            F.least(F.lit(1000).cast("long"), F.expr("(1000 * _quota) div n_docs")),
        )
        .select("source", "keep_per_mille")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
        .withColumn("bucket", split_bucket("doc_id"))
        .join(F.broadcast(rates), "source")
        .where(F.col("bucket") < F.col("keep_per_mille"))
        .select("doc_id", "source", "bucket", "keep_per_mille")
    )


def temperature_sample_sql(
    table: str = "documents",
    target_per_mille: int = 500,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`temperature_sample` (``//`` is DuckDB's integer
    division, matching the Spark casts' truncation on these all-positive
    operands)."""
    bucket = split_bucket_sql(id_col)
    return f"""
WITH counts AS (
  SELECT {source_col} AS source, count(*) AS n_docs,
         CAST(floor(sqrt(count(*))) AS BIGINT) AS w
  FROM {table} GROUP BY {source_col}
),
tot AS (SELECT sum(n_docs) AS _total, sum(w) AS _sumw FROM counts),
rates AS (
  SELECT source,
         CAST(least(1000, (1000 * (((_total * {int(target_per_mille)}) // 1000) * w // _sumw)) // n_docs)
           AS BIGINT) AS keep_per_mille
  FROM counts, tot
)
SELECT {id_col} AS doc_id, d.{source_col} AS source,
       CAST({bucket} AS BIGINT) AS bucket, keep_per_mille
FROM {table} d JOIN rates ON d.{source_col} = rates.source
WHERE {bucket} < keep_per_mille
""".strip()


def select_top_quality(
    docs: DataFrame,
    keep_per_mille: int = 300,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-ranked data selection: keep the best ``keep_per_mille``‰ of
    each source's documents by a cheap integer quality score — the
    filter-by-quality-percentile pass of a curation pipeline (select the
    top 30% of web text, per domain, before training).

    Score: lexical-diversity micro-ratio ``n_distinct·10⁶ div n_tokens``
    (the same signal x19's quality gate thresholds absolutely; here it
    ranks RELATIVELY within the source, which adapts to each source's
    score distribution instead of one global cutoff).  Ties break on the
    lower doc id, making the kept set exactly reproducible.

    Shape: score is computed map-side; one shuffle partitions by source and
    ranks with a window; the per-source keep count is ceil(n_s·k/1000).
    At 100 TB a source is millions of rows and the full per-source sort is
    the honest cost of exact percentile selection; the cheaper approximate
    path — per-source score threshold from ``stats.grouped_quantiles``,
    then a map-side filter — trades exact counts for zero sorting and is
    the drop-in alternative when ties/count-exactness don't matter.

    Output: (doc_id, source, score_micro, q_rank) for kept rows.
    """
    from pyspark.sql import Window

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.expr(
            f"size(array_distinct(split({text_col}, ' '))) * 1000000 "
            f"div size(split({text_col}, ' '))"
        ).alias("score_micro"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    nw = Window.partitionBy("source")
    return (
        scored.withColumn("q_rank", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(nw))
        .where(
            F.col("q_rank")
            <= F.expr(f"(_n * {int(keep_per_mille)} + 999) div 1000")
        )
        .select("doc_id", "source", "score_micro", "q_rank")
    )


def select_top_quality_sql(
    table: str = "documents", keep_per_mille: int = 300
) -> str:
    """DuckDB twin of :func:`select_top_quality`."""
    return f"""
WITH scored AS (
  SELECT doc_id, source,
         length(list_distinct(string_split(text, ' '))) * 1000000
           // length(string_split(text, ' ')) AS score_micro
  FROM {table}
)
SELECT doc_id, source, score_micro,
       CAST(row_number() OVER (
         PARTITION BY source ORDER BY score_micro DESC, doc_id ASC
       ) AS BIGINT) AS q_rank
FROM scored
QUALIFY q_rank <= (count(*) OVER (PARTITION BY source) * {int(keep_per_mille)} + 999) // 1000
""".strip()


def leakage_free_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_per_mille: int = 800,
    val_per_mille: int = 100,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Cluster-aware split assignment: every member of an exact-duplicate
    cluster gets the SAME split, so a duplicated document can never sit in
    train while its twin sits in test — the leakage guard a benchmark-safe
    split requires (plain per-id bucketing, :func:`assign_splits`, gives
    duplicates independent coin flips).

    ``hash_mode='xxhash64'`` (production) clusters on a 64-bit content hash
    so the shuffle never carries document bodies — a hash collision can
    merge two distinct documents into one split cluster (P ≈ n²/2⁶⁵;
    conservative for splits: colliding docs land in the SAME split).
    ``hash_mode='exact'`` groups on the text itself, bit-identical to the
    SQL oracle — the mode the correctness gate runs (same escape hatch as
    ``text.duplicated_spans``).

    The cluster representative is ``min(id)`` over identical content; the
    split bucket hashes the REPRESENTATIVE id through the same portable
    scramble as :func:`split_bucket`.  For near-dup (MinHash/SimHash)
    clusters, feed this the resolved ``cluster`` column from
    ``dedup.resolve_clusters`` instead of the content groupBy.

    Scale shape (100 TB): one hash aggregation keyed on the content (carry a
    content hash, not the body, into the shuffle) plus one id-keyed join to
    fan the representative back onto members — both AQE-planned; the split
    expression itself is a per-row projection.  Output:
    (doc_id, rep_id, split).
    """
    if hash_mode == "exact":
        content = F.col(text_col)
    elif hash_mode == "xxhash64":
        content = F.xxhash64(F.col(text_col))
    else:
        raise ValueError(f"hash_mode must be 'xxhash64' or 'exact', got {hash_mode!r}")
    reps = (
        df.select(F.col(id_col), content.alias("_ch"))
        .groupBy("_ch")
        .agg(F.min(id_col).alias("rep_id"))
    )
    keyed = df.select(F.col(id_col), content.alias("_ch"))
    b = split_bucket("rep_id")
    return (
        keyed.join(reps, "_ch")
        .select(
            id_col,
            F.col("rep_id").cast("long").alias("rep_id"),
            F.when(b < train_per_mille, "train")
            .when(b < train_per_mille + val_per_mille, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def leakage_free_splits_sql(
    train_per_mille: int = 800, val_per_mille: int = 100
) -> str:
    """DuckDB twin of :func:`leakage_free_splits` over ``documents``
    (groups on the text itself — value-identical to grouping on a
    collision-free content hash)."""
    bucket = split_bucket_sql("r.rep_id")
    return f"""
WITH reps AS (
  SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text
)
SELECT d.doc_id, CAST(r.rep_id AS BIGINT) AS rep_id,
       CASE WHEN {bucket} < {train_per_mille} THEN 'train'
            WHEN {bucket} < {train_per_mille + val_per_mille} THEN 'val'
            ELSE 'test' END AS split
FROM documents d JOIN reps r USING (text)
"""


def training_shards(
    docs: DataFrame,
    world_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed-training shard assignment + balance audit: every document
    lands on exactly one of ``world_size`` data-parallel ranks via the
    portable id scramble (content-independent, reshuffle-free on re-runs),
    and the audit reports each shard's document and token load plus its
    deviation from the ideal equal share — the check a training launch runs
    before a 1000-GPU job discovers rank 7 has 3× the tokens.

    Scale shape (100 TB): shard id is a per-row projection; the audit is one
    ``world_size``-key hash aggregation with map-side combine.  The
    deviation is exact integer per-mille of the ideal share:
    ``shard_tokens·world_size·1000 div total_tokens − 1000`` (positive =
    overloaded) — the numerator stays positive, so truncating and flooring
    division agree and the expression is engine-portable.

    Output: (shard, n_docs, n_tokens, dev_pm), one row per shard.
    """
    from pyspark.sql import Window

    from .text import token_count

    shard = F.pmod(split_bucket(id_col), F.lit(world_size))
    per = (
        docs.select(shard.alias("shard"), token_count(text_col).alias("_t"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("_tot"),
    ).select(
        "shard",
        "n_docs",
        "n_tokens",
        (F.expr(f"(n_tokens * {world_size} * 1000) div _tot") - 1000)
        .cast("long")
        .alias("dev_pm"),
    )


def training_shards_sql(world_size: int = 8, table: str = "documents") -> str:
    """DuckDB twin of :func:`training_shards`."""
    bucket = split_bucket_sql("doc_id")
    return f"""
WITH per AS (
  SELECT ({bucket}) % {world_size} AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY 1
)
SELECT shard, n_docs, n_tokens,
       CAST((n_tokens * {world_size} * 1000)
            // CAST(sum(n_tokens) OVER () AS BIGINT) - 1000 AS BIGINT) AS dev_pm
FROM per
"""


def fixed_size_sample(
    docs: DataFrame,
    k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly-k-per-group deterministic sample — the eyeball/eval draw
    ("give me 5 random docs from every source, reproducibly").  Where
    :func:`stratified_sample` is Bernoulli (a RATE per stratum, size varies),
    this guarantees the exact count: rank by the seeded order scramble
    within each group and keep rank ≤ k.

    Shape at 100 TB: one shuffle on the group key, per-group TOP-K — Spark
    plans a rank window; when k is small the per-partition sort is a
    bounded heap under AQE, and no global order exists anywhere.  Groups
    smaller than k return whole.

    Output: (group, id, sample_rank), sample_rank 1-based.
    """
    from pyspark.sql import Window

    h = order_scramble(id_col, seed)
    return (
        docs.select(F.col(group_col).alias("grp"), F.col(id_col), h.alias("ord"))
        .withColumn("sample_rank", F.row_number().over(
            Window.partitionBy("grp").orderBy("ord", id_col)).cast("long"))
        .where(F.col("sample_rank") <= k)
        .select(F.col("grp").alias(group_col), id_col, "sample_rank")
    )


def fixed_size_sample_sql(
    table: str = "documents",
    k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`fixed_size_sample`."""
    h = order_scramble_sql(id_col, seed)
    return f"""
WITH h AS (SELECT {group_col}, {id_col}, {h} AS ord FROM {table})
SELECT {group_col}, {id_col},
       CAST(row_number() OVER (
         PARTITION BY {group_col} ORDER BY ord, {id_col}
       ) AS BIGINT) AS sample_rank
FROM h
QUALIFY sample_rank <= {int(k)}
""".strip()


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int = 1500,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budgeted data selection: keep each source's best documents
    until the source's cumulative token count reaches ``budget_tokens`` —
    the "N tokens per domain" mixture cap every pretraining recipe applies
    (quality-first greedy fill; a doc is kept iff it fits ENTIRELY within
    the remaining budget at its rank).

    Ordering is the same lexical-diversity micro-score as
    :func:`select_top_quality` (ties on lower id), so the kept set is
    exactly reproducible and the two selectors compose: percentile-cap by
    quality, then budget-cap by tokens.

    Shape at 100 TB: score and token count are map-side; one shuffle
    partitions by source; the running sum is a per-source window (no
    global ordering).  A hot source serializes its own prefix sum — the
    sharded two-pass prefix sum (x33 seq packing) is the drop-in when a
    single source exceeds a task's comfort zone.

    Output: (doc_id, source, n_tokens, cum_tokens) for kept rows.
    """
    from pyspark.sql import Window

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        F.expr(
            f"size(array_distinct(split({text_col}, ' '))) * 1000000 "
            f"div size(split({text_col}, ' '))"
        ).alias("score_micro"),
        F.expr(f"size(split({text_col}, ' '))").cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .where(F.col("cum_tokens") <= budget_tokens)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def token_budget_select_sql(
    table: str = "documents", budget_tokens: int = 1500
) -> str:
    """DuckDB twin of :func:`token_budget_select`."""
    return f"""
WITH scored AS (
  SELECT doc_id, source,
         length(list_distinct(string_split(text, ' '))) * 1000000
           // length(string_split(text, ' ')) AS score_micro,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM {table}
)
SELECT doc_id, source, n_tokens,
       CAST(sum(n_tokens) OVER (
         PARTITION BY source ORDER BY score_micro DESC, doc_id ASC
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_tokens
FROM scored
QUALIFY cum_tokens <= {int(budget_tokens)}
""".strip()


def negative_samples(
    docs: DataFrame,
    k: int = 3,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs via a
    bucketed consistent-hash ring: every document sits on a ring at its
    scrambled key; each anchor probes the ring at ``k`` independent seeded
    positions and takes the next document clockwise — reproducible on any
    cluster size, any execution order, and (unlike modular id offsets) any
    id distribution, dense or sparse.  Candidates with the anchor's exact
    content and the anchor itself are EXCLUDED at pick time (the next valid
    document wins) — a duplicate is a false negative that actively poisons
    a contrastive objective, so the dup check is part of the operator.

    Shape: the ring is aggregated into one SORTED slot array per bucket
    (bounded by bucket size — pick ``n_buckets`` proportional to corpus
    size, the usual ring-sharding rule, so arrays stay O(100s) regardless
    of N); probes equi-join their bucket and the successor scan is a
    codegen array filter — no row blowup, one shuffle each side.  The
    clockwise wrap stays inside the bucket; a probe in an empty bucket
    yields no negative for that slot (vanishingly rare at real bucket
    occupancy).

    Output: (anchor_id, neg_id, j) — j is the 1-based slot.
    """
    bwidth = HASH_MOD // n_buckets + 1
    nkey = order_scramble(id_col, seed=0)
    ring = (
        docs.select(
            F.col(id_col).alias("neg_id"),
            F.col(text_col).alias("_ntext"),
            nkey.alias("nkey"),
        )
        .withColumn("bucket", F.expr(f"nkey div {bwidth}"))
        .groupBy("bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("nkey", "neg_id", "_ntext"))
            ).alias("slots")
        )
    )
    probes = (
        docs.select(F.col(id_col).alias("anchor_id"), F.col(text_col).alias("_atext"))
        .select(
            "anchor_id",
            "_atext",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("j"),
                        order_scramble("anchor_id", seed=j).alias("pkey"),
                    )
                    for j in range(1, k + 1)
                ])
            ).alias("p"),
        )
        .select("anchor_id", "_atext", "p.j", "p.pkey")
        .withColumn("bucket", F.expr(f"pkey div {bwidth}"))
    )
    valid = lambda x: (x["_ntext"] != F.col("_atext")) & (  # noqa: E731
        x["neg_id"] != F.col("anchor_id")
    )
    joined = probes.join(ring, "bucket").select(
        "anchor_id",
        "j",
        F.coalesce(
            F.get(F.filter("slots", lambda x: (x["nkey"] >= F.col("pkey")) & valid(x)), 0),
            F.get(F.filter("slots", valid), 0),
        ).alias("best"),
    )
    return joined.where(F.col("best").isNotNull()).select(
        "anchor_id",
        F.col("best.neg_id").alias("neg_id"),
        F.col("j").cast("long").alias("j"),
    )


def negative_samples_sql(
    table: str = "documents", k: int = 3, n_buckets: int = 64
) -> str:
    """DuckDB twin of :func:`negative_samples`.

    Restated flat (r8, VERDICT r7 item 2): the original twin aggregated each
    bucket into one sorted slot LIST and ``list_filter``-ed it per probe —
    the hash join then copies a bucket-sized list (text included) onto every
    probe row, which spilled >75 GB at sf3.0.  The flat form streams the
    same candidate set through one bucket-keyed join and picks each probe's
    winner with ``arg_min`` over the composite order key ``nkey·2³³ +
    neg_id`` — exactly the (nkey, neg_id) order ``list_sort`` used (neg_id
    is unique, so text never decided a tie).  Same output, bounded memory:
    no lists, the texts live only inside the join's validity predicate."""
    bwidth = HASH_MOD // n_buckets + 1
    nkey = order_scramble_sql("doc_id", seed=0)
    arms = "\nUNION ALL\n".join(
        f"SELECT anchor_id, atext, {j} AS j, "
        f"{order_scramble_sql('anchor_id', seed=j)} AS pkey FROM a"
        for j in range(1, k + 1)
    )
    return f"""
WITH s AS (
  SELECT doc_id AS neg_id, text AS ntext, {nkey} AS nkey,
         ({nkey}) // {bwidth} AS bucket,
         ({nkey}) * 8589934592 + doc_id AS skey
  FROM {table}
),
a AS (SELECT doc_id AS anchor_id, text AS atext FROM {table}),
probes AS (
{arms}
),
cand AS (
  SELECT p.anchor_id, p.j, x.neg_id, x.skey, x.nkey >= p.pkey AS ge
  FROM probes p JOIN s x ON p.pkey // {bwidth} = x.bucket
  WHERE x.ntext <> p.atext AND x.neg_id <> p.anchor_id
)
SELECT anchor_id,
       coalesce(arg_min(neg_id, skey) FILTER (WHERE ge),
                arg_min(neg_id, skey)) AS neg_id,
       CAST(j AS BIGINT) AS j
FROM cand GROUP BY anchor_id, j
"""

