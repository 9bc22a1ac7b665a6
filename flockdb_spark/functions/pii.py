"""PII redaction — the scrubbing pass every production training-corpus
pipeline runs before text leaves curation (emails, phone numbers, IP
addresses replaced by typed placeholder tokens, with per-rule counts kept
for auditing).

Engine-portability rules: patterns use explicit character classes
(``[0-9]`` not ``\\d`` where possible), no alternation and no lookaround —
the subset where Java regex (Spark) and RE2 (DuckDB, which has NO
lookaround) agree exactly, so the whole pass is oracle-checkable.  Pure
``regexp_replace``/``regexp_count`` column expressions: per-row JVM regex
in whole-stage codegen, zero shuffles, trivially scale-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (rule name, pattern, replacement) — applied in order; order matters
#: (emails contain dots and digits, so they redact before IPs/phones).
PII_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b",
        "<PHONE>",
    ),
]


def redacted_text(col: Column | str) -> Column:
    """The text with every rule applied, in rule order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, redacted text, one count column per rule).

    Counts are taken on the ORIGINAL text (an email inside a redacted span
    must not be double-counted by a later rule — the replace chain already
    guarantees that; counting pre-redaction keeps the audit numbers
    independent of rule order)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pattern)).cast("long").alias(f"n_{name}")
        for name, pattern, _ in PII_RULES
    ]
    return df.select(
        id_col,
        redacted_text(text_col).alias("redacted"),
        *counts,
    )


def _sql_quote(pattern: str) -> str:
    # DuckDB ordinary string literals keep backslashes LITERALLY (no escape
    # processing) — only quotes need doubling
    return "'" + pattern.replace("'", "''") + "'"


def redacted_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`redacted_text` (RE2; same pattern subset)."""
    out = expr
    for _, pattern, repl in PII_RULES:
        out = f"regexp_replace({out}, {_sql_quote(pattern)}, '{repl}', 'g')"
    return out


def redact_pii_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`redact_pii` over a (doc_id, text) table/CTE."""
    counts = ", ".join(
        f"CAST(length(regexp_extract_all(text, {_sql_quote(p)})) AS BIGINT) AS n_{name}"
        for name, p, _ in PII_RULES
    )
    return (
        f"SELECT doc_id, {redacted_text_sql('text')} AS redacted, {counts} "
        f"FROM {table}"
    )
