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
    # vocabulary document-frequency table, and the scoring join) — cache it
    # so tokenize+explode+combine runs once
    terms = doc_terms(docs, text_col).cache()
    if query_terms is None:
        query_terms = top_df_terms(terms)

    n_docs, sum_dl = docs.select(
        F.count(F.lit(1)), F.sum(F.size(tokens(text_col)))
    ).first()
    avgdl_milli = sum_dl * 1000 // n_docs

    df_table = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    q = F.broadcast(query_terms.select("term").join(df_table, "term"))

    scored = terms.join(q, "term")
    term_score = F.expr(
        f"(((({n_docs} - df) * 1000000) div (df + 1) + 1) * tf * {K1_MILLI + 1000}) "
        f"div (tf * 1000 + ({K1_MILLI} * ({1000 - B_MILLI} + ({B_MILLI} * dl * 1000) div {avgdl_milli})) div 1000)"
    )
    return (
        scored.select("doc_id", term_score.alias("term_score"))
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
