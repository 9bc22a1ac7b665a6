"""BM25 relevance scoring over the documents table — the retrieval primitive
a training-data pipeline uses for query-targeted corpus selection (and the
classic quality-weighting companion to the dedup/quality operators).

All arithmetic is integer (micro/milli fixed-point with floor division) so
scores are bit-identical across engines and across reduction orders — the
same portability rule as the integer PageRank in ``analytics.py``.

Scale shape (100 TB corpus):
  tokenize+explode -> (doc, term) partial-count   [1 shuffle, map-side combine]
  term document-frequency                          [tiny: |vocabulary| rows]
  query terms broadcast into the (doc,term) table  [no shuffle]
  per-doc score sum                                [1 shuffle on doc_id]
The vocabulary and corpus-stats sides are broadcast; only the token table is
big, and it is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

K1_MILLI = 1200  # BM25 k1 = 1.2
B_MILLI = 750  # BM25 b = 0.75


def doc_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dl, term, tf): term frequency per document plus doc length."""
    toks = tokens(text_col)
    return (
        docs.select("doc_id", F.size(toks).cast("long").alias("dl"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def doc_term_arrays(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, _toks, _memo_fence): the doc-grain tokenized projection — the
    CACHEABLE shape of the corpus token table (one row per document, ~an
    order of magnitude fewer rows than the exploded stream; the same r11
    trade that fixed heavy_hitters' cross-pass cache).

    ``_memo_fence`` (a constant, RLE-trivial in the columnar cache) exists so
    the plan is NOT ``sameResult``-equal to the bare (doc_id, tokens)
    projection several unrelated queries contain: without it, once the
    session memo caches this table, Spark's CacheManager silently substitutes
    it into x32/x45/x102-class plans, serving their bench lines from the BM25
    family's cache — exactly the cross-query cost mis-attribution bench.py's
    pass protocol exists to prevent (it unpersists leaked per-query caches
    for the same reason).  Only the memo's explicit consumers reference this
    plan object directly."""
    return docs.select(
        "doc_id",
        tokens(text_col).alias("_toks"),
        F.lit(1).alias("_memo_fence"),
    )


#: map-side per-document term frequencies from the token array: for each
#: DISTINCT token t of the doc, tf = how many array slots equal t.  Pure
#: codegen (higher-order functions), no shuffle — replaces the corpus-sized
#: groupBy(doc_id, dl, term) exchange for UNIQUE-doc_id corpora (every doc's
#: tokens live in one row, so within-doc counting needs no data movement;
#: doc_id uniqueness is the module's standing assumption — scores are per
#: doc_id).  _toks is referenced twice on purpose: CollapseProject keeps the
#: producing projection separate (split() is non-cheap and multiply
#: referenced), so the tokenize still runs once per row.
_TF_PAIRS = (
    "transform(array_distinct(_toks), "
    "t -> struct(t AS term, size(filter(_toks, x -> x = t)) AS tf))"
)


def _terms_from_arrays(arrs: DataFrame) -> DataFrame:
    """The (doc_id, dl, term, tf) view re-derived map-side from the doc-grain
    array table — row-identical to :func:`doc_terms` when doc_id is unique."""
    return (
        arrs.select(
            "doc_id",
            F.size("_toks").cast("long").alias("dl"),
            F.explode(F.expr(_TF_PAIRS)).alias("p"),
        )
        .select(
            "doc_id", "dl", F.col("p.term").alias("term"),
            F.col("p.tf").cast("long").alias("tf"),
        )
    )


def top_df_terms(term_table: DataFrame, n: int = 5, min_len: int = 4) -> DataFrame:
    """The n highest-document-frequency terms of at least ``min_len`` chars
    (tie-break: term ascending) — a deterministic stand-in for user query
    terms.  Output: (term, df)."""
    return (
        term_table.where(F.length("term") >= min_len)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n)
    )


def _corpus_stats(terms: DataFrame) -> tuple[int, int]:
    """(n_docs, avgdl_milli) from the cached (doc, term, tf) table — NOT a
    second tokenize of the corpus.  Every document appears in the table
    (``split`` always yields ≥1 token, so dl ≥ 1), making this exactly the
    oracle's stats CTE.

    Kept as a BLOCKING driver action on purpose (r8, measured): this first
    action materializes the shared terms cache, so the scoring graph's
    other consumers all read warm partitions.  The plan-riding alternative
    (1-row broadcast cross join) removed the barrier but let the broadcast
    build's subtrees race on the cold cache — the tokenize ran 3× and
    sf1.0 walls rose 15-40%.  The scalars then fold into the scoring
    expression as LITERALS, which Catalyst constant-folds inside the
    whole-stage-codegen span (a 1-row join on the stream measured a
    further 15-20% BroadcastNestedLoopJoin tax)."""
    row = (
        terms.groupBy("doc_id")
        .agg(F.max("dl").alias("dl"))
        .agg(F.count(F.lit(1)), F.sum("dl"))
        .first()
    )
    n_docs = int(row[0])
    if n_docs == 0:
        raise ValueError(
            "bm25 corpus stats: the corpus has no documents (n_docs = 0) — "
            "avgdl is undefined; score a non-empty documents table"
        )
    return n_docs, int(row[1]) * 1000 // n_docs


#: session-level corpus-stats memo keyed by (analyzed-plan semantic hash,
#: text_col): the BM25 family (x25 bm25_scores, x99 bm25_topk) pays the
#: tokenize + blocking stats warm-up ONCE per (corpus, text_col) per
#: session — exactly how a retrieval deployment amortizes its corpus
#: statistics across endpoints.  The memo OWNS the cached terms table
#: (callers must NOT unpersist it); release via :func:`release_corpus_memo`.
#: Bounded: oldest entry is unpersisted + evicted past _CORPUS_MEMO_MAX.
#: hybrid_rrf_topk inlines the query-term set as literal expressions (an
#: array_intersect filter + a term→query_ids map) instead of broadcast
#: joins when the distinct query-term count is at most this — past it the
#: literal expression tree itself becomes the cost (codegen size) and the
#: broadcast-join plan takes over.  Both paths are row-identical (pytest).
_LEX_LITERAL_MAX_TERMS = 4096


def _sql_str(s: str) -> str:
    """A Spark-SQL single-quoted string literal for ``s`` (terms are
    whitespace-split tokens, but quotes/backslashes still need escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

_CORPUS_MEMO: dict[
    tuple[int, str, str], tuple[DataFrame, int, int, DataFrame, DataFrame]
] = {}
_CORPUS_MEMO_MAX = 8


def _plan_key(df: DataFrame) -> tuple[int, str]:
    """Memo identity of an (assumed-immutable) input plan: the analyzed
    plan's 32-bit semanticHash PLUS its canonicalized tree string — the
    string disambiguates the (rare but possible) 32-bit hash collision
    between two different corpora, which would otherwise silently serve the
    wrong n_docs/avgdl as constant-folded literals."""
    qe = df._jdf.queryExecution().analyzed()
    return qe.semanticHash(), qe.canonicalized().toString()


def corpus_terms_stats(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, int, int, DataFrame]:
    """The shared (cached_terms, n_docs, avgdl_milli, cached_df_table) for
    ``docs`` — memoized per (corpus plan, text_col) so repeated scorers in one
    session reuse one tokenize and one stats action.  The identity is the
    ANALYZED plan's (semanticHash, canonicalized tree string): two reads of
    the same parquet path key equal, a different source or projection does
    not, and a 32-bit hash collision between different corpora cannot alias
    (see _plan_key).

    The document-frequency table (term, df) is corpus statistics exactly like
    n_docs/avgdl — every family member (x25's idf + query derivation, x99's
    query table) re-aggregated it from the full exploded token stream on each
    use (one vocabulary-sized shuffle per consumer).  It is memoized CACHED
    but LAZY (r11): the first consumer materializes it warm over the cached
    arrays, later consumers reuse the vocab-grain table.  Its plan derives
    from the fenced ``arrs`` projection, so the CacheManager cannot
    substitute it into non-memo queries (see doc_term_arrays)."""
    key = (*_plan_key(docs), text_col)
    hit = _CORPUS_MEMO.get(key)
    if hit is not None:
        return (*hit[:3], hit[4])
    # What caches is the DOC-GRAIN token-array table, not the exploded
    # grouped stream (r11): the (doc_id, dl, term, tf) view is re-derived
    # map-side from the cached arrays per consumer (_TF_PAIRS — pure
    # codegen, no shuffle), so the corpus-sized groupBy(doc_id, dl, term)
    # exchange of the build disappears AND the cache materializes ~10×
    # fewer rows.  Measured (this box): cold build + one scoring pass
    # 2.6 s → 1.95 s at sf0.1, 14.1–15.8 s → 11.0–13.1 s at sf1.0,
    # bit-identical scores (probe in OPTIMIZATION_r11.md).  The blocking
    # stats action doubles as the cache materializer, exactly as before
    # (see _corpus_stats' rationale) — it is now a plain count+sum over
    # doc-grain rows (no groupBy(doc_id) needed: doc_id is unique, the
    # module's standing assumption).
    arrs = doc_term_arrays(docs, text_col).cache()
    row = arrs.agg(
        F.count(F.lit(1)).cast("long"), F.sum(F.size("_toks")).cast("long")
    ).first()
    n_docs = int(row[0])
    if n_docs == 0:
        raise ValueError(
            "bm25 corpus stats: the corpus has no documents (n_docs = 0) — "
            "avgdl is undefined; score a non-empty documents table"
        )
    avgdl_milli = int(row[1]) * 1000 // n_docs
    terms = _terms_from_arrays(arrs)
    dftab = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .cache()
    )
    while len(_CORPUS_MEMO) >= _CORPUS_MEMO_MAX:
        oldest = next(iter(_CORPUS_MEMO))  # dicts iterate in insertion order
        _, _, _, old_arrs, old_dftab = _CORPUS_MEMO.pop(oldest)
        old_arrs.unpersist()
        old_dftab.unpersist()
    _CORPUS_MEMO[key] = (terms, n_docs, avgdl_milli, arrs, dftab)
    return terms, n_docs, avgdl_milli, dftab


def release_corpus_memo() -> None:
    """Unpersist and drop every memoized corpus-stats entry (bench calls this
    at pass boundaries so the first BM25-family query of a pass still pays
    the warm-up cold; tests call it to keep the fixture JVM lean)."""
    for entry in _CORPUS_MEMO.values():
        entry[3].unpersist()
        entry[4].unpersist()
    _CORPUS_MEMO.clear()


#: session-level row-count memo keyed by the analyzed plan's semantic hash.
#: A table's row count is CATALOG STATISTICS, not query work — a deployment's
#: catalog knows it, and DuckDB reads it from parquet footers in microseconds
#: — so callers that only need |T| of an immutable input (the hybrid leg
#: selector, the lexical n_docs literal) shouldn't schedule a scan job per
#: construction.  Assumes immutable input plans (the same assumption the
#: edge store's memoized layout makes); tests reset via release_count_memo.
_N_ROWS_MEMO: dict[tuple[int, str], int] = {}


def cached_count(df: DataFrame) -> int:
    key = _plan_key(df)
    n = _N_ROWS_MEMO.get(key)
    if n is None:
        n = df.count()
        _N_ROWS_MEMO[key] = n
    return n


def release_count_memo() -> None:
    _N_ROWS_MEMO.clear()


def _term_score(n_docs: int, avgdl_milli: int) -> F.Column:
    """The shared BM25 term score — identical integer arithmetic in
    ``bm25_scores`` and ``bm25_topk`` (and their oracles); df / tf / dl are
    columns of the joined scoring row, the corpus stats are constant-folded
    literals (see :func:`_corpus_stats`)."""
    return F.expr(
        f"(((({n_docs} - df) * 1000000) div (df + 1) + 1) * tf * {K1_MILLI + 1000}) "
        f"div (tf * 1000 + ({K1_MILLI} * ({1000 - B_MILLI} + ({B_MILLI} * dl * 1000)"
        f" div {avgdl_milli})) div 1000)"
    )


def bm25_scores(
    docs: DataFrame, query_terms: DataFrame | None = None, text_col: str = "text"
) -> DataFrame:
    """Integer BM25: score_micro(doc) = Σ_t idf_micro(t) · tf·(k1+1)·1000
    div (tf·1000 + k1·(1000 − b + b·dl·1000 div avgdl_milli)).

    ``query_terms`` is a (term, ...) DataFrame; defaults to
    ``top_df_terms(...)`` over the corpus itself.  idf uses the simple
    non-negative form ((N − df)·1e6 div (df+1)) + 1.  Returns
    (doc_id, score_micro) for documents matching ≥1 query term.
    """
    # the token table feeds three consumers (query-term derivation, the
    # vocabulary document-frequency table, and the scoring join): the
    # session memo caches it AND runs the deliberate blocking stats action
    # (see _corpus_stats — the warm-up serializes the cache materialization
    # before the consumers fan out; measured faster than plan-riding stats
    # at sf1.0).  The memo owns the cache — nothing to release per-query.
    terms, n_docs, avgdl_milli, df_table = corpus_terms_stats(docs, text_col)
    if query_terms is None:
        # the default query derivation is a slice of the memoized df table
        # (filtering term length before or after the df aggregation is
        # equivalent: df counts (doc, term) rows per term) — row-identical
        # to top_df_terms(terms) but re-aggregates nothing (r11)
        query_terms = (
            df_table.where(F.length("term") >= 4)
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(5)
        )
    q = F.broadcast(query_terms.select("term").join(df_table, "term"))

    scored = terms.join(q, "term")
    return (
        scored.select("doc_id", _term_score(n_docs, avgdl_milli).alias("term_score"))
        .groupBy("doc_id")
        .agg(F.sum("term_score").cast("long").alias("score_micro"))
    )


def bm25_oracle_sql(n_terms: int = 5, min_len: int = 4) -> str:
    """DuckDB twin of ``bm25_scores`` with derived query terms."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 (CAST(sum(dl) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS avgdl_milli
          FROM (SELECT doc_id, max(dl) AS dl FROM tf GROUP BY doc_id)),
qterms AS (SELECT term, df FROM dfreq WHERE length(term) >= {min_len}
           ORDER BY df DESC, term ASC LIMIT {n_terms})
SELECT doc_id,
       CAST(sum(
         (((s.n - q.df) * 1000000) // (q.df + 1) + 1) * tf.tf * {K1_MILLI + 1000}
         // (tf.tf * 1000 + ({K1_MILLI} * ({1000 - B_MILLI} + ({B_MILLI} * tf.dl * 1000) // s.avgdl_milli)) // 1000)
       ) AS BIGINT) AS score_micro
FROM tf JOIN qterms q USING (term) CROSS JOIN stats s
GROUP BY doc_id
"""


def bm25_topk(
    docs: DataFrame,
    n_queries: int = 5,
    terms_per_query: int = 2,
    k: int = 10,
    min_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Multi-query BM25 top-k retrieval — the serving-shaped dual of
    :func:`bm25_scores`: N queries are answered in ONE corpus pass, each
    returning its ``k`` best documents.  This is the query-targeted corpus
    selection step of a training-data pipeline (retrieve the top documents
    per probe query, then feed them to curation), and the batch analogue of
    an online retrieval endpoint.

    The query set is derived deterministically for the gate fixture: the
    ``n_queries·terms_per_query`` highest-document-frequency terms (≥
    ``min_len`` chars, ties by term), chunked in rank order into queries of
    ``terms_per_query`` terms.  In production the query table is
    user-supplied and tiny — exactly what the broadcast below assumes.

    Scale shape (100 TB corpus): one tokenize+explode builds (doc, term,
    tf) with map-side combine [the only corpus-sized shuffle]; the query
    table is BROADCAST into it (no shuffle); per-(query, doc) partial sums
    combine map-side; the final top-k is a ``row_number`` window keyed by
    query_id — N tiny sorted partitions.  Scoring arithmetic is identical
    to :func:`bm25_scores` (integer micro fixed-point, floor division) so
    results are bit-identical across engines and reduction orders.

    Output: (query_id, doc_id, score_micro, rnk) with rnk ≤ k.
    """
    from pyspark.sql import Window

    # shared per-(corpus, text_col) memo: one tokenize + one blocking stats
    # warm-up serves the whole BM25 family in a session (see corpus_terms_stats)
    terms, n_docs, avgdl_milli, df_table = corpus_terms_stats(docs, text_col)

    # fixture query derivation: global row_number over the (df DESC, term)
    # ranking.  The single-partition window sorts only the ≥min_len slice of
    # the VOCABULARY (not the corpus) and exists only to make the fixture
    # self-contained — a real deployment passes its own (query_id, term) table.
    qn = n_queries * terms_per_query
    w0 = Window.orderBy(F.desc("df"), F.asc("term"))
    qtab = (
        df_table.where(F.length("term") >= min_len)
        .withColumn("rn", F.row_number().over(w0))
        .where(F.col("rn") <= qn)
        .select(
            "term",
            "df",
            F.expr(f"cast((rn - 1) div {terms_per_query} as long)").alias("query_id"),
        )
    )

    scored = terms.join(F.broadcast(qtab), "term")
    per_doc = (
        scored.select("query_id", "doc_id", _term_score(n_docs, avgdl_milli).alias("ts"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ts").cast("long").alias("score_micro"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rnk", F.row_number().over(wq).cast("long"))
        .where(F.col("rnk") <= k)
    )


def bm25_topk_sql(
    n_queries: int = 5, terms_per_query: int = 2, k: int = 10, min_len: int = 4
) -> str:
    """DuckDB twin of :func:`bm25_topk` over ``documents``."""
    qn = n_queries * terms_per_query
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 (CAST(sum(dl) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS avgdl_milli
          FROM (SELECT doc_id, max(dl) AS dl FROM tf GROUP BY doc_id)),
qrank AS (SELECT term, df,
                 row_number() OVER (ORDER BY df DESC, term ASC) AS rn
          FROM dfreq WHERE length(term) >= {min_len}),
qtab AS (SELECT term, df, CAST((rn - 1) // {terms_per_query} AS BIGINT) AS query_id
         FROM qrank WHERE rn <= {qn}),
per AS (
  SELECT q.query_id, tf.doc_id,
         CAST(sum(
           (((s.n - q.df) * 1000000) // (q.df + 1) + 1) * tf.tf * {K1_MILLI + 1000}
           // (tf.tf * 1000 + ({K1_MILLI} * ({1000 - B_MILLI} + ({B_MILLI} * tf.dl * 1000) // s.avgdl_milli)) // 1000)
         ) AS BIGINT) AS score_micro
  FROM tf JOIN qtab q USING (term) CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM per
)
SELECT query_id, doc_id, score_micro, rnk FROM ranked WHERE rnk <= {k}
"""


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the keyword-extraction /
    query-targeted-selection primitive (the per-document dual of the
    corpus-level BM25 above).

    Integer micro fixed-point throughout (idf uses BM25's non-negative form
    ``((N − df)·1e6 div (df+1)) + 1``), so scores are bit-identical across
    engines.  Ties break by term ascending.

    Scale shape (100 TB): one shuffle builds the (doc, term, tf) table with
    map-side combine; the document-frequency table is term-keyed and joins
    the token table on its existing term partitioning; the final top-k is a
    ``row_number`` window keyed by doc_id — one more shuffle, no global sort.
    Output: (doc_id, term, score_micro, rnk).
    """
    from pyspark.sql import Window

    terms = doc_terms(docs, text_col)
    # n_docs rides the plan folded into the VOCABULARY-sized df side (never
    # a 1-row cross join on the corpus stream — the BNLJ tax scales with the
    # corpus); no separate count job, no driver barrier (r8)
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    df_table = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(nd))
    )
    scored = terms.join(df_table, "term").select(
        "doc_id",
        "term",
        F.expr("(((n_docs - df) * 1000000) div (df + 1) + 1) * tf")
        .cast("long")
        .alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` over ``documents``."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST((((n.n_docs - d.df) * 1000000) // (d.df + 1) + 1) * tf.tf AS BIGINT)
           AS score_micro
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score_micro,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score_micro DESC, term ASC) AS BIGINT) AS rnk
  FROM scored
)
SELECT doc_id, term, score_micro, rnk FROM ranked WHERE rnk <= {k}
"""


def inverted_index(
    docs: DataFrame, max_postings: int = 8, text_col: str = "text"
) -> DataFrame:
    """Posting-list build: per term, its document frequency and the top
    ``max_postings`` documents by (tf DESC, doc_id ASC), comma-joined — the
    index artifact a retrieval-augmented pipeline materializes next to the
    corpus (serving side of the BM25 scorer above).

    Scale shape (100 TB): the (doc, term, tf) table shuffles once with
    map-side combine; posting selection is a ``row_number`` window keyed by
    term — sort-based and spillable, so a stopword-sized hot term degrades to
    disk sort rather than OOM (the reason this is NOT a ``collect_list`` of
    the full posting set); document frequency aggregates the same term-keyed
    partitioning, so AQE plans the final join shuffle-free on the term side.
    Output: (term, df, postings).
    """
    from pyspark.sql import Window

    terms = doc_terms(docs, text_col)
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    kept = (
        terms.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= max_postings)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", "doc_id"))),
                    lambda s: s.doc_id.cast("string"),
                ),
            ).alias("postings")
        )
    )
    df_table = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return df_table.join(kept, "term").select("term", "df", "postings")


def inverted_index_sql(max_postings: int = 8) -> str:
    """DuckDB twin of :func:`inverted_index` over ``documents``."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rnk
  FROM tf
),
posting AS (
  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rnk) AS postings
  FROM ranked WHERE rnk <= {max_postings} GROUP BY term
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT d.term, d.df, p.postings
FROM dfreq d JOIN posting p USING (term)
"""


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    k_dense: int = 20,
    k_lex: int = 20,
    rrf_k: int = 60,
    text_col: str = "text",
    dense_fn=None,
    dense_brute_max_dots: int = 10**9,
    n_docs: int | None = None,
    n_vectors: int | None = None,
) -> DataFrame:
    """Hybrid retrieval: fuse a DENSE ranking (embedding cosine top-k) with a
    LEXICAL ranking (IDF-weighted term-overlap top-k) by reciprocal-rank
    fusion — the standard two-tower retrieval recipe (Cormack et al. 2009:
    RRF(d) = Σ_lists 1/(κ + rank_list(d))), here in exact integer micro
    units: ``rrf_micro = Σ 1_000_000 div (rrf_k + rank)`` over the lists that
    ranked the document, so fusion is bit-identical across engines.

    Each query id must exist in BOTH tables (``documents.doc_id`` for the
    lexical leg, ``embeddings.vec_id`` for the dense leg — the driver fixture
    aligns the two id spaces; x61 audits that alignment).  The query document
    itself is excluded from both legs.

    Scale shape (100 TB corpus):
      dense leg   — pluggable via ``dense_fn(emb, query_ids, k) ->
                    (query_id, neighbor_id, rank)``.  When omitted, the
                    leg AUTO-SELECTS (r7, the x84 stats-driven pattern):
                    brute-force GEMM while the dot budget
                    ``n_vectors · |Q| ≤ dense_brute_max_dots`` (the full
                    GEMM beats signing L hash tables whenever |Q| < L, so
                    small workloads never pay the index), else
                    ``lsh_ann_topk`` at its auto-sized shape — sub-linear
                    candidate generation so scale users don't inherit the
                    O(corpus·|Q|) brute default.  x101 gates the brute
                    branch, x110 gates an explicit ANN ``dense_fn`` against
                    an oracle that replays the multi-probe dense leg in
                    SQL; a plan test pins that the ANN path engages at the
                    threshold.
      lexical leg — the (query_id, term) table is COLLECTED once at
                    construction (bounded by the |Q| query documents'
                    vocabulary at any corpus size) so both of its broadcast
                    uses are free local-table builds; the corpus token
                    stream is FILTERED against the broadcast query-term
                    union BEFORE any shuffle (only a
                    term occurring in some query document can score), so
                    the only exchanges are over the matched subset:
                    distinct (doc, term), the per-term df, and the
                    per-(query, doc) IDF sums — never a vocabulary-sized
                    aggregation.  Worst case (all query terms are
                    stopwords) degrades gracefully to the full stream.
      fusion      — a full-outer join of two ≤(k_dense+k_lex)·|Q|-row frames:
                    driver-trivial at any corpus size.

    Output: (query_id, doc_id, rrf_micro, rank) with rank ≤ k, ranked by
    (rrf_micro DESC, doc_id ASC).
    """
    from pyspark.sql import Window

    from .similarity import brute_force_topk, lsh_ann_topk

    qids = [int(i) for i in query_ids]
    toks = tokens(text_col)
    # query-side terms: explode ONLY the |Q| query documents and COLLECT
    # them (r9 job audit) — the (query_id, term) set is bounded by the |Q|
    # query documents' vocabulary at ANY corpus size, and as a plan subtree
    # it was re-executed by EVERY broadcast build that referenced it (the
    # term filter AND the scoring join each re-ran the |Q|-doc scan as
    # their own job: 18 jobs/pass at sf0.1, ~4 of them corpus-path scans).
    # As driver literals both broadcasts become local-table builds — zero
    # extra jobs.  n_docs folds into the scoring expression the same way
    # (the 1-row crossJoin broadcast was a third re-run).
    qterm_rows = None
    if dense_fn is None:
        # one metadata-cheap count decides the leg (same rule family as
        # lsh_auto_shape / heavy_hitters 'auto').  Callers that read from
        # parquet pass ``n_vectors``/``n_docs`` from the FOOTER statistics
        # (sources.edges.parquet_nrows — the same catalog path DuckDB's
        # count(*) takes, r10); the Spark count job is only the fallback
        # for non-parquet inputs, session-memoized as catalog statistics
        if n_vectors is None:
            n_vectors = cached_count(emb)
        if n_vectors * max(len(qids), 1) <= dense_brute_max_dots:
            # ONE construction job for BOTH driver-bounded query-side sets
            # (r11, guide §1.3/§2.4): the dense leg's query vectors and the
            # lexical leg's query terms collect through a single tagged
            # union (similarity._collect_legs) instead of two back-to-back
            # job launches.  float→double widening is exact, so the GEMM
            # quantization sees the same values the standalone collect did.
            from .similarity import _collect_legs

            term_leg = docs.where(F.col("doc_id").isin(qids)).select(
                F.col("doc_id").cast("long").alias("qid"),
                F.explode(toks).alias("term"),
                F.lit(None).cast("array<double>").alias("vec"),
            )
            vec_leg = emb.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").cast("long").alias("qid"),
                F.lit(None).cast("string").alias("term"),
                F.col("embedding").cast("array<double>").alias("vec"),
            )
            qterm_rows, qvec_rows = _collect_legs([term_leg, vec_leg])
            qvecs = [(int(r["qid"]), r["vec"]) for r in qvec_rows]
            dense_fn = (  # noqa: E731
                lambda e, q, kk: brute_force_topk(e, q, k=kk, query_rows=qvecs)
            )
        else:
            dense_fn = (  # noqa: E731
                lambda e, q, kk: lsh_ann_topk(e, q, k=kk, n_vectors=n_vectors)
            )
    dense = dense_fn(emb, qids, k_dense).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("dense_rank"),
    )

    if qterm_rows is None:
        qterm_rows = (
            docs.where(F.col("doc_id").isin(qids))
            .select(F.col("doc_id").alias("qid"), F.explode(toks).alias("term"))
            .collect()
        )
    # dedup driver-side (r11): the collect is bounded by the |Q| query
    # documents' token count either way, and dropping the .distinct() drops
    # that job's shuffle stage — the construction pays one map-only stage
    qterm_pairs = sorted({(int(r["qid"]), r["term"]) for r in qterm_rows})
    if n_docs is None:
        n_docs = cached_count(docs)
    # corpus side: scan+explode, filter to query terms BEFORE the distinct
    # shuffle — df(t) and candidate scoring both derive from this matched
    # subset (df must count the query docs too, so the self-exclusion
    # happens only at scoring time)
    # SHUFFLE FOLD (r10): each stage pair below shares ONE exchange.  An
    # explicit repartition on the COARSER key satisfies the downstream
    # operators' ClusteredDistribution requirements (hash(term) co-locates
    # every (doc, term) pair; hash(query_id) every (query, doc) pair), so
    # the df-window rides one term exchange, and the score aggregate +
    # top-k window ride one query_id exchange.
    # LITERAL FOLD (r11, guide §2.4/§3): the query-term set is ALREADY a
    # driver literal, so the two broadcast-join uses below were paying a
    # broadcast-exchange build + join stage each for a table the plan could
    # inline.  Under ``_LEX_LITERAL_MAX_TERMS`` the term filter becomes a
    # map-side ``array_intersect`` against a literal array (which also
    # dedups per doc — the separate ``.distinct()`` aggregate disappears)
    # and the scoring join becomes a literal term→query_ids map lookup —
    # zero broadcast builds, same two exchanges, row-identical (pytest pins
    # literal ≡ broadcast-join; the sf0.1 A/B measured 1.75 s → 0.83 s).
    # Above the bound (adversarially huge query docs) the broadcast-join
    # path below is the same plan as r10.
    terms = sorted({t for _, t in qterm_pairs})
    use_literal = 0 < len(terms) <= _LEX_LITERAL_MAX_TERMS
    if use_literal:
        term_to_qids: dict[str, list[int]] = {}
        for q, tm in qterm_pairs:
            term_to_qids.setdefault(tm, []).append(q)
        # ONE F.expr per literal structure (not one F.lit per element): with
        # hundreds of terms, per-element Column construction is hundreds of
        # py4j round trips of pure driver latency (~0.4 s at |terms|=111);
        # a single SQL string parses JVM-side in one call
        terms_sql = "array(" + ",".join(_sql_str(t) for t in terms) + ")"
        map_sql = "map(" + ",".join(
            _sql_str(tm)
            + ",array("
            + ",".join(f"{q}L" for q in sorted(term_to_qids[tm]))
            + ")"
            for tm in terms
        ) + ")"
        qid_map = F.expr(map_sql)
        matched = docs.select(
            "doc_id",
            F.explode(F.array_intersect(toks, F.expr(terms_sql))).alias("term"),
        ).repartition("term")
    else:
        qterms = docs.sparkSession.createDataFrame(
            qterm_pairs, "query_id long, term string"
        )
        matched = (
            docs.select("doc_id", F.explode(toks).alias("term"))
            .join(F.broadcast(qterms.select("term").distinct()), "term")
            .select("doc_id", "term")
            .repartition("term")
            .distinct()
        )
    # ONE corpus pass (r8): df(t) is a count window keyed by term over the
    # matched subset (matched is distinct (doc, term), so the window count
    # IS the document frequency) — this replaces the separate idf broadcast
    # table, whose build job re-ran the corpus explode+filter+distinct a
    # second time (a genuine double pass at 100 TB; caching the subset
    # instead measured slower than the window at sf1.0 — the cache write of
    # a corpus-sized intermediate costs more than one term-keyed shuffle).
    wt = Window.partitionBy("term")
    with_query = matched.withColumn(
        "df", F.count(F.lit(1)).over(wt).cast("long")
    )
    if use_literal:
        with_query = with_query.withColumn(
            "query_id", F.explode(qid_map[F.col("term")])
        )
    else:
        with_query = with_query.join(F.broadcast(qterms), "term")
    lex_scored = (
        with_query
        .where(F.col("doc_id") != F.col("query_id"))
        .repartition("query_id")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.expr(f"((({n_docs} - df) * 1000000) div (df + 1)) + 1")
            ).cast("long").alias("lex_score")
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("lex_score"), F.asc("doc_id"))
    lex = (
        lex_scored.withColumn("lex_rank", F.row_number().over(wl).cast("long"))
        .where(F.col("lex_rank") <= k_lex)
        .select("query_id", "doc_id", "lex_rank")
    )

    # fusion as union + sum (algebraically identical to the former
    # full-outer join + coalesce: a doc present in one leg contributes that
    # leg's term, in both legs the sum of both): two ≤k·|Q|-row inputs meet
    # in ONE query_id exchange that the final top-k window then reuses —
    # the join needed a (query_id, doc_id) exchange per side plus the
    # window's own
    fused = (
        dense.select(
            "query_id",
            "doc_id",
            F.expr(f"1000000 div ({rrf_k} + dense_rank)").cast("long").alias("c"),
        )
        .unionAll(
            lex.select(
                "query_id",
                "doc_id",
                F.expr(f"1000000 div ({rrf_k} + lex_rank)").cast("long").alias("c"),
            )
        )
        .repartition("query_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("long").alias("rrf_micro"))
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .where(F.col("rank") <= k)
    )


def hybrid_rrf_sql(
    query_ids: list[int],
    k: int = 10,
    k_dense: int = 20,
    k_lex: int = 20,
    rrf_k: int = 60,
    dense_ctes: str | None = None,
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk` over ``documents``/``embeddings``.

    ``dense_ctes`` mirrors the Spark side's pluggable ``dense_fn``: a
    WITH-clause body whose LAST cte must be ``dense(query_id, doc_id,
    dense_rank)`` with dense_rank ≤ k_dense.  Default is the exact
    brute-force leg; the x110 gate passes the multi-probe LSH leg."""
    ids = ", ".join(str(int(i)) for i in query_ids)
    quant = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000))"
    if dense_ctes is None:
        dense_ctes = f"""q AS (
  SELECT vec_id AS query_id, {quant} AS qv FROM embeddings
  WHERE vec_id IN ({ids})
),
c AS (SELECT vec_id AS doc_id, {quant} AS ev FROM embeddings),
dense AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(list_dot_product(qv, ev) AS BIGINT) DESC, doc_id ASC
         ) AS BIGINT) AS dense_rank
  FROM q, c WHERE doc_id <> query_id
  QUALIFY dense_rank <= {k_dense}
)"""
    return f"""
WITH {dense_ctes},
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
qterms AS (
  SELECT tf.doc_id AS query_id, tf.term, d.df
  FROM tf JOIN dfreq d USING (term) WHERE tf.doc_id IN ({ids})
),
lexs AS (
  SELECT q.query_id, t.doc_id,
         CAST(sum((((n.n_docs - q.df) * 1000000) // (q.df + 1)) + 1) AS BIGINT)
           AS lex_score
  FROM tf t JOIN qterms q USING (term) CROSS JOIN n
  WHERE t.doc_id <> q.query_id
  GROUP BY q.query_id, t.doc_id
),
lex AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY lex_score DESC, doc_id ASC
         ) AS BIGINT) AS lex_rank
  FROM lexs QUALIFY lex_rank <= {k_lex}
),
fused AS (
  SELECT coalesce(d.query_id, l.query_id) AS query_id,
         coalesce(d.doc_id, l.doc_id) AS doc_id,
         CAST(coalesce(1000000 // ({rrf_k} + d.dense_rank), 0)
            + coalesce(1000000 // ({rrf_k} + l.lex_rank), 0) AS BIGINT) AS rrf_micro
  FROM dense d FULL OUTER JOIN lex l
    ON d.query_id = l.query_id AND d.doc_id = l.doc_id
)
SELECT query_id, doc_id, rrf_micro,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id ASC
       ) AS BIGINT) AS rank
FROM fused QUALIFY rank <= {k}
"""


def top_bigram(docs: DataFrame, text_col: str = "text") -> tuple[str, str]:
    """The corpus's most frequent adjacent word pair (ties: w1, w2 ascending)
    — the deterministic phrase fixture for :func:`phrase_match` gates.  One
    explode + one combine-heavy aggregate; the collect pulls a single row
    (a parameter, not data)."""
    t = F.col("_t")
    pairs = (
        docs.select(F.split(F.col(text_col), " ").alias("_t"))
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(1)
        .first()
    )
    return str(pairs["w1"]), str(pairs["w2"])


def phrase_match(
    docs: DataFrame, phrase: list[str], text_col: str = "text"
) -> DataFrame:
    """Exact-phrase search: documents containing the ``m`` words of
    ``phrase`` CONSECUTIVELY, with the number of (possibly overlapping)
    occurrences — the positional-index query a retrieval pipeline runs for
    quoted phrases, here as a scan-fused predicate instead of a positional
    posting join.

    Scale shape (100 TB): the whole operator is ONE codegen projection over
    the corpus scan — per document, scan the token array once with a
    higher-order ``filter`` over candidate start positions (no explode, no
    shuffle, no Python).  The only exchange is whatever the caller does with
    the (doc_id, n_matches) result.  A positional inverted index (x59's
    sibling) would beat this for low-selectivity phrases over an INDEXED
    corpus; for the one-shot curation pass this is the optimal single-scan
    plan.

    Output: (doc_id, n_matches) with n_matches ≥ 1.
    """
    m = len(phrase)
    if m < 1:
        raise ValueError("phrase must have at least one word")
    t = F.col("_t")
    sel = docs.select("doc_id", F.split(F.col(text_col), " ").alias("_t"))
    # candidate starts 1..size-m+1, guarded: sequence(1, 0) would generate a
    # DESCENDING range, so short docs take the explicit empty-array branch
    starts = F.expr(
        f"CASE WHEN size(_t) >= {m} THEN sequence(1, size(_t) - {m - 1}) "
        f"ELSE CAST(array() AS array<int>) END"
    )

    def pred(i):
        c = F.element_at(t, i.cast("int")) == F.lit(phrase[0])
        for j in range(1, m):
            c = c & (F.element_at(t, (i + F.lit(j)).cast("int")) == F.lit(phrase[j]))
        return c

    n_matches = F.size(F.filter(starts, pred)).cast("long")
    return (
        sel.select("doc_id", n_matches.alias("n_matches"))
        .where(F.col("n_matches") >= 1)
    )


def phrase_match_sql() -> str:
    """DuckDB twin of the x102 gate: derive the top corpus bigram, then count
    its per-document occurrences via the pair stream (join form — same counts
    as the scan form for m=2, overlapping matches included)."""
    return """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
flat AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
  FROM tok
),
pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM flat),
top AS (
  SELECT w1, w2 FROM pairs GROUP BY w1, w2
  ORDER BY count(*) DESC, w1 ASC, w2 ASC LIMIT 1
)
SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM pairs p JOIN top USING (w1, w2)
GROUP BY p.doc_id
"""


def phrase_match_top_bigram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The x102 gate composition as ONE lazy plan: derive the corpus's most
    frequent adjacent word pair (ties: pair ascending) and count its
    per-document occurrences with the same scan-fused higher-order filter
    as :func:`phrase_match` — but the phrase arrives as a broadcast 1-row
    join instead of collected literals, so nothing blocks the driver and
    the whole query is a single Spark job (at corpus scale the derivation
    aggregate and the counting scan still share one tokenize via Spark's
    scan reuse; a production caller with a KNOWN phrase uses
    :func:`phrase_match` and pays only the scan).

    Output: (doc_id, n_matches) with n_matches ≥ 1 — identical to
    ``phrase_match(docs, top_bigram(docs))``.
    """
    t = F.col("_t")
    top = (
        docs.select(F.split(F.col(text_col), " ").alias("_t"))
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("p")
        )
        .groupBy("p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(1)
        .select("w1", "w2")
    )
    sel = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_t")
    ).crossJoin(F.broadcast(top))
    starts = F.expr(
        "CASE WHEN size(_t) >= 2 THEN sequence(1, size(_t) - 1) "
        "ELSE CAST(array() AS array<int>) END"
    )
    pred = lambda i: (  # noqa: E731
        (F.element_at(t, i.cast("int")) == F.col("w1"))
        & (F.element_at(t, (i + F.lit(1)).cast("int")) == F.col("w2"))
    )
    n_matches = F.size(F.filter(starts, pred)).cast("long")
    return (
        sel.select("doc_id", n_matches.alias("n_matches"))
        .where(F.col("n_matches") >= 1)
    )


def multi_phrase_match(
    docs: DataFrame, phrases: DataFrame | None = None, n_phrases: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Batch exact-phrase search: N two-word phrases answered in ONE corpus
    pass — the batcher dual of :func:`phrase_match`, shaped like x99's
    multi-query BM25 (and the reference's batch selectEdges): the phrase
    table is broadcast into a single map-side bigram stream instead of N
    separate scans.

    ``phrases`` is a (phrase_id, w1, w2) DataFrame; when omitted the
    fixture derives the ``n_phrases`` most frequent corpus bigrams (count
    DESC, pair ASC), phrase_id = rank − 1 — derived lazily from the same
    pair stream, so the whole query stays one plan.

    Scale shape (100 TB): the bigram stream is generated map-side
    (zip-with-tail, no explode join); the tiny phrase table broadcasts
    into it; per-(phrase, doc) counts combine map-side — one corpus-sized
    shuffle at doc grain.  Overlapping occurrences count, as in
    ``phrase_match``.

    Output: (phrase_id, doc_id, n_matches), n_matches ≥ 1.
    """
    from pyspark.sql import Window

    pairs = (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("_t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    if phrases is None:
        # top-N first via a distributed TakeOrdered (orderBy + limit — a
        # tree-reduced top-k, never a global sort), THEN rank: the window
        # only ever sees the n_phrases surviving rows, so the single
        # partition it runs in is constant-sized — the bigram count table
        # itself (vocabulary²-sized at 100 TB) never funnels through one
        # partition
        w0 = Window.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        phrases = (
            pairs.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
            .limit(n_phrases)
            .withColumn("rn", F.row_number().over(w0))
            .select((F.col("rn") - 1).cast("long").alias("phrase_id"), "w1", "w2")
        )
    return (
        pairs.join(F.broadcast(phrases), ["w1", "w2"])
        .groupBy("phrase_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
    )


def multi_phrase_match_sql(n_phrases: int = 5) -> str:
    """DuckDB twin of the x107 gate (derived top-bigram phrase set)."""
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
flat AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
  FROM tok
),
pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM flat),
ranked AS (
  SELECT w1, w2,
         row_number() OVER (ORDER BY count(*) DESC, w1 ASC, w2 ASC) AS rn
  FROM pairs GROUP BY w1, w2
),
phrases AS (
  SELECT CAST(rn - 1 AS BIGINT) AS phrase_id, w1, w2
  FROM ranked WHERE rn <= {n_phrases}
)
SELECT ph.phrase_id, p.doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM pairs p JOIN phrases ph USING (w1, w2)
GROUP BY ph.phrase_id, p.doc_id
"""
