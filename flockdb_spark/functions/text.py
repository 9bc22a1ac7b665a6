"""Text-analysis operators for the training-data pipeline: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  Ratios are computed as exact integer
counts first and divided/rounded at the end so results are reproducible across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: marker stopwords per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "les", "et", "est", "une"),
}

STOPWORDS = LANG_MARKERS["en"]

FP_MOD = 1_000_000_007  # polynomial rolling-hash modulus
FP_BASE = 31


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the baseline tokenizer)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-flavored upper bound: words plus an extra token per 4 chars of
    long words — the kind of cheap token estimator a 100 TB corpus pass uses
    instead of running a real tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(tokens(c)) + F.aggregate(
        tokens(c),
        F.lit(0),
        lambda acc, w: acc + F.when(F.length(w) > 4, (F.length(w) - 1).cast("int") / F.lit(4)).otherwise(F.lit(0)).cast("int"),
    )


def _count_in(words: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: char/token counts, distinct-token count,
    mean token length, stopword ratio — the standard cheap quality filters."""
    w = tokens(text_col)
    return df.select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars_m"),
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.round(
            (F.length(text_col) - F.size(w) + 1) / F.size(w), 4
        ).alias("avg_token_len"),
        F.round(_count_in(w, STOPWORDS) / F.size(w), 4).alias("stop_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID.  Deterministic argmax with fixed
    tie-break order en > de > es > fr."""
    w = tokens(text_col)
    hits = {code: _count_in(w, m) for code, m in LANG_MARKERS.items()}
    pred = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]), "en")
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), "de")
        .when(hits["es"] >= hits["fr"], "es")
        .otherwise("fr")
    )
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[hits[c].cast("long").alias(f"hits_{c}") for c in LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over the document's characters
    (h = h*31 + ascii(c) mod 1e9+7) — an engine-portable stand-in for a
    rolling Rabin fingerprint; used for cheap doc identity and simhash-style
    derivations."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda x: x != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, ch: F.pmod(h * FP_BASE + F.ascii(ch), F.lit(FP_MOD)),
    )


# DuckDB twins ---------------------------------------------------------------

FINGERPRINT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_filter(string_split({col}, ''), x -> x <> ''), "
    "x -> CAST(ascii(x) AS BIGINT))), "
    f"(h, c) -> (h * {FP_BASE} + c) % {FP_MOD})"
)


def lang_hits_sql(col: str, code: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[code])
    return (
        f"CAST(length(list_filter(string_split({col}, ' '), w -> w IN ({markers}))) AS BIGINT)"
    )
