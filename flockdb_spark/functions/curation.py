"""Curation pipeline API — the composition layer over the proven gate
operators.  x19 and x48 are instances of this shape; real corpus passes
need it as a LIBRARY: pick gates, set thresholds, run one DAG.

    curated = curate(
        docs,
        gates=[lang_gate(min_hits=1), repetition_gate(max_per_mille=150),
               boilerplate_gate(max_micro=300_000)],
        finalize=[chunker(chunk_tokens=20, overlap=5)],
    )

Design rules (the same ones the x-series gates are graded on at 100 TB):

- Every gate is a ROW FILTER over the document frame — stateless
  projections Catalyst fuses into one scan stage; corpus-dependent gates
  (boilerplate) compute their statistic over the FULL input corpus and
  join it onto the gated subset, exactly like x48.
- The token projection is computed ONCE into a ``_w`` working column that
  every gate reuses (per-gate re-tokenization would multiply the dominant
  per-row cost); ``curate`` strips working columns before finalizers run.
- Finalizers are arbitrary schema-changing stages (dedup collapse,
  chunking, token budgets) applied in order after all gates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text

#: a gate: (docs_with_tokens, full_corpus) -> filtered docs_with_tokens
Gate = Callable[[DataFrame, DataFrame], DataFrame]
#: a finalizer: docs -> anything
Finalizer = Callable[[DataFrame], DataFrame]

_W = "_w"  # shared tokens working column


def _w(df: DataFrame) -> Column:
    return F.col(_W)


def lang_gate(markers: tuple[str, ...] = text.STOPWORDS, min_hits: int = 1) -> Gate:
    """Keep documents with ≥ ``min_hits`` marker-word hits (x10/x19/x48's
    language gate; swap ``markers`` per target language)."""

    def gate(df: DataFrame, corpus: DataFrame) -> DataFrame:
        return df.where(text._count_in(_w(df), markers) >= min_hits)

    return gate


def quality_gate(
    min_tokens: int = 5, max_tokens: int = 10_000, min_distinct_micro: int = 300_000
) -> Gate:
    """Length band + distinct-token ratio floor (x08/x19's quality gate)."""

    def gate(df: DataFrame, corpus: DataFrame) -> DataFrame:
        n = F.size(_w(df))
        return df.where(
            n.between(min_tokens, max_tokens)
            & (F.size(F.array_distinct(_w(df))) * 1_000_000 / n >= min_distinct_micro)
        )

    return gate


def repetition_gate(max_per_mille: int = 150, n: int = 3) -> Gate:
    """Drop documents whose repeated-n-gram share exceeds the threshold
    (x32/x48's repetition gate); integer per-mille to stay engine-portable."""

    def gate(df: DataFrame, corpus: DataFrame) -> DataFrame:
        w = _w(df)
        grams = F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        n_g = F.size(grams)
        nd_g = F.size(F.array_distinct(grams))
        return df.where((n_g == 0) | ((n_g - nd_g) * 1000 / n_g < max_per_mille))

    return gate


def boilerplate_gate(
    max_micro: int = 300_000, n: int = 5, min_docs: int = 3
) -> Gate:
    """Corpus-dependent gate (x37/x48): n-grams appearing in ≥ ``min_docs``
    documents of the FULL corpus are boilerplate; drop documents whose
    boilerplate coverage exceeds ``max_micro`` (ppm).  The coverage statistic
    is computed over ``corpus`` — the pre-gate input — so earlier gates don't
    bias the document-frequency table, then joined onto the gated subset."""

    def gate(df: DataFrame, corpus: DataFrame) -> DataFrame:
        cov = text.boilerplate_coverage(corpus, n=n, min_docs=min_docs)
        keep = cov.where(F.col("boiler_micro") < max_micro).select("doc_id")
        return df.join(keep, "doc_id")

    return gate


def exact_dedup_finalizer(
    text_col: str = "text", id_col: str = "doc_id"
) -> Finalizer:
    """Collapse exact duplicates to the smallest id (x01/x19's rule).
    Schema-changing: output is (id, n_tokens)."""

    def run(df: DataFrame) -> DataFrame:
        return df.groupBy(text_col).agg(
            F.min(id_col).alias(id_col),
            F.any_value(F.size(text.tokens(text_col))).cast("long").alias("n_tokens"),
        ).drop(text_col)

    return run


def token_budget_finalizer(budget: int, id_col: str = "doc_id") -> Finalizer:
    """Running-total cutoff in id order (x19's budget stage), built on the
    sharded prefix sum — no global single-partition window."""

    def run(df: DataFrame) -> DataFrame:
        from . import packing

        return (
            packing.ordered_prefix_sum(
                df.select(id_col, "n_tokens"), id_col, "n_tokens",
                out_col="cum_tokens", chunk=4096,
            )
            .select(id_col, "n_tokens", F.col("cum_tokens").cast("long").alias("cum_tokens"))
            .where(F.col("cum_tokens") <= budget)
        )

    return run


def chunker(chunk_tokens: int = 20, overlap: int = 5) -> Finalizer:
    """Overlapping chunking of the survivors (x45/x48's final stage)."""

    def run(df: DataFrame) -> DataFrame:
        return text.chunk_documents(
            df.select("doc_id", "text"), chunk_tokens=chunk_tokens, overlap=overlap
        )

    return run


def curate(
    docs: DataFrame,
    gates: list[Gate],
    finalize: list[Finalizer] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Run the curation DAG: tokenize once → apply every gate (row filters
    over one fused scan; corpus-dependent gates see the full input) → strip
    working columns → apply finalizers in order."""
    staged = docs.withColumn(_W, text.tokens(text_col))
    out = staged
    for gate in gates:
        out = gate(out, docs)
    out = out.drop(_W)
    for fin in finalize or []:
        out = fin(out)
    return out


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Snapshot diff between two corpus versions — the release artifact an
    iterative dataset pipeline publishes with every refresh: which documents
    were added, removed, or modified (content hash changed) since the last
    version.

    Scale shape (100 TB): both sides project down to (id, content-hash)
    BEFORE the join, so the shuffle carries two slim columns instead of
    document bodies; the join is a single id-keyed full-outer merge and the
    unchanged majority is filtered out of the result.  Output:
    (doc_id, change) with change ∈ {'added','removed','modified'}.

    ``hash_mode='xxhash64'`` (production) compares 64-bit content hashes —
    a collision hides a modification with P ≈ n/2⁶⁴ per changed doc.
    ``hash_mode='exact'`` carries and compares the text itself,
    bit-identical to the SQL oracle — the mode the correctness gate runs.
    """
    if hash_mode == "exact":
        def content(c):
            return F.col(c)
    elif hash_mode == "xxhash64":
        def content(c):
            return F.xxhash64(F.col(c))
    else:
        raise ValueError(f"hash_mode must be 'xxhash64' or 'exact', got {hash_mode!r}")
    oh = old.select(F.col(id_col), content(text_col).alias("_oh"))
    nh = new.select(F.col(id_col), content(text_col).alias("_nh"))
    j = oh.join(nh, id_col, "full_outer")
    return (
        j.select(
            id_col,
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") != F.col("_nh"), F.lit("modified"))
            .alias("change"),
        )
        .where(F.col("change").isNotNull())
    )


def corpus_diff_sql(old_sql: str, new_sql: str) -> str:
    """DuckDB twin of :func:`corpus_diff` (hash-free: compares the text
    itself, which is value-identical to comparing a collision-free hash on
    gate-sized data)."""
    return f"""
WITH o AS (SELECT doc_id, text FROM {old_sql}),
n AS (SELECT doc_id, text FROM {new_sql}),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text <> n.text THEN 'modified'
         END AS change
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
)
SELECT doc_id, change FROM j WHERE change IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Linear quality classifier — the model-based filter step
# ---------------------------------------------------------------------------

#: integer weights of the linear quality model.  In production these are the
#: distilled coefficients of a trained classifier (a fasttext/logistic quality
#: model reduced to cheap engineered features — the standard way to run a
#: "model-based" filter over 100 TB without GPU inference); here they are
#: fixed plausible values so the gate is deterministic.  The score is a pure
#: int64 dot product — no division, no floats — so it is bit-identical across
#: engines and reduction orders.
QC_WEIGHTS = {
    "bias": -1200,
    "stop_pm": 4,      # per-mille stopword ratio: English prose scores up
    "wlen_milli": -1,  # milli mean token length: penalize code/URL soup
    "digit_pm": -6,    # per-mille digit chars: penalize tables/serials
    "upper_pm": -3,    # per-mille uppercase chars: penalize shouting/headers
    "cap_tokens": 2,   # token count capped at 400: reward substantial docs
}
QC_THRESHOLD = 0


def quality_classifier(
    docs: DataFrame, threshold: int = QC_THRESHOLD, text_col: str = "text"
) -> DataFrame:
    """Model-based quality filter: an integer linear classifier over cheap
    engineered features, scored in one codegen projection — zero shuffles,
    zero Python, the shape that applies a quality model to a 100 TB corpus
    as part of the scan it was already doing.

    Features (all exact int64, floor division on non-negative counts):
    per-mille stopword ratio, milli mean token length, per-mille digit and
    uppercase character ratios, and the token count capped at 400.
    ``score = bias + w·f`` and ``keep = score >= threshold`` (kept as an
    int column so the cross-engine hash compare sees identical dtypes).

    Output: (doc_id, score, keep).
    """
    w = text.tokens(text_col)
    W = QC_WEIGHTS
    # staged projection: counts materialize once per row, then one integer
    # expression folds them into the score (Catalyst fuses both projections
    # into the scan stage — .explain shows a single WholeStageCodegen span)
    staged = docs.select(
        "doc_id",
        F.greatest(F.size(w).cast("long"), F.lit(1)).alias("nt"),
        F.greatest(F.length(text_col).cast("long"), F.lit(1)).alias("nc"),
        F.size(F.filter(w, lambda x: x.isin(*text.STOPWORDS))).cast("long").alias("stop_cnt"),
        (
            F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
        ).cast("long").alias("digit_cnt"),
        (
            F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), "[A-Z]", ""))
        ).cast("long").alias("upper_cnt"),
    )
    score = F.expr(
        f"{W['bias']}L"
        f" + {W['stop_pm']} * ((stop_cnt * 1000) div nt)"
        f" + {W['wlen_milli']} * (((nc - nt + 1) * 1000) div nt)"
        f" + {W['digit_pm']} * ((digit_cnt * 1000) div nc)"
        f" + {W['upper_pm']} * ((upper_cnt * 1000) div nc)"
        f" + {W['cap_tokens']} * least(nt, 400L)"
    )
    return staged.select(
        "doc_id",
        score.cast("long").alias("score"),
        (score >= F.lit(threshold)).cast("long").alias("keep"),
    )


def quality_classifier_sql(threshold: int = QC_THRESHOLD) -> str:
    """DuckDB twin of :func:`quality_classifier` over ``documents``."""
    W = QC_WEIGHTS
    feats = (
        "SELECT doc_id,\n"
        "       greatest(CAST(length(string_split(text, ' ')) AS BIGINT), 1) AS nt,\n"
        "       greatest(CAST(length(text) AS BIGINT), 1) AS nc,\n"
        "       CAST(length(list_filter(string_split(text, ' '),"
        f" x -> x IN ({', '.join(repr(s) for s in text.STOPWORDS)}))) AS BIGINT) AS stop_cnt,\n"
        "       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digit_cnt,\n"
        "       CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS upper_cnt\n"
        "FROM documents"
    )
    score = (
        f"{W['bias']}"
        f" + {W['stop_pm']} * ((stop_cnt * 1000) // nt)"
        f" + {W['wlen_milli']} * (((nc - nt + 1) * 1000) // nt)"
        f" + {W['digit_pm']} * ((digit_cnt * 1000) // nc)"
        f" + {W['upper_pm']} * ((upper_cnt * 1000) // nc)"
        f" + {W['cap_tokens']} * least(nt, 400)"
    )
    return f"""
WITH feats AS (
{feats}
)
SELECT doc_id,
       CAST({score} AS BIGINT) AS score,
       CAST(CASE WHEN ({score}) >= {threshold} THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM feats
"""


#: the probe's feature vector, shared by the classifier above and the fitter
#: below: (name, integer SQL expression over the staged counts).  f0 is the
#: intercept.  Spark `div` / DuckDB `//` spellings differ only in the
#: operator, handled at render time.
PROBE_FEATURES = [
    ("f0", "1"),
    ("f1", "(stop_cnt * 1000) {d} nt"),        # per-mille stopword ratio
    ("f2", "((nc - nt + 1) * 1000) {d} nt"),   # milli mean token length
    ("f3", "(digit_cnt * 1000) {d} nc"),       # per-mille digit chars
    ("f4", "(upper_cnt * 1000) {d} nc"),       # per-mille uppercase chars
    ("f5", "least(nt, {L400})"),               # capped token count
]


def _staged_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """The shared engineered-count projection (doc_id, nt, nc, stop_cnt,
    digit_cnt, upper_cnt, lang) — one codegen stage over the scan."""
    w = text.tokens(text_col)
    return docs.select(
        "doc_id",
        "lang",
        F.greatest(F.size(w).cast("long"), F.lit(1)).alias("nt"),
        F.greatest(F.length(text_col).cast("long"), F.lit(1)).alias("nc"),
        F.size(F.filter(w, lambda x: x.isin(*text.STOPWORDS))).cast("long").alias("stop_cnt"),
        (
            F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
        ).cast("long").alias("digit_cnt"),
        (
            F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), "[A-Z]", ""))
        ).cast("long").alias("upper_cnt"),
    )


def probe_fit_stats(
    docs: DataFrame, label_lang: str = "en", text_col: str = "text"
) -> DataFrame:
    """Sufficient statistics for TRAINING the linear quality probe — the
    "fit" dual of :func:`quality_classifier`'s "apply": one corpus pass
    accumulates the normal-equation sums XᵀX and Xᵀy over the same
    engineered features (plus intercept), with the weak label
    ``y = 1[lang = label_lang]``.  The driver then solves the k×k system
    (:func:`solve_probe`) — this is how a quality/language probe is
    actually trained at 100 TB: the distributed work is a single
    map-side-combined aggregation emitting k·(k+3)/2 numbers; no per-row
    model math, no iterations, no shuffle of anything data-sized.

    Each per-row product is widened to decimal(38,0) (HUGEINT in the
    oracle) BEFORE the multiply — f2 is unbounded, so even a single row's
    64-bit product could wrap — and accumulation stays widened, so the
    sums cannot wrap; the emitted BIGINT cast is exact while
    n_docs · max(fᵢ·fⱼ) < 2⁶³ (typical product ≈ 10⁸ → safe to ~9·10¹⁰
    documents; past that BOTH engines raise a loud CAST_OVERFLOW on the
    output cast — never a silent wrap — and the caller should clamp f2 or
    consume the decimal sums directly).

    Output: (cell, s) — cell ∈ {'fi.fj' (i ≤ j), 'fi.y'}, 27 rows for the
    6-feature probe.
    """
    staged = _staged_counts(docs, text_col)
    fexprs = [(n, e.format(d="div", L400="400L")) for n, e in PROBE_FEATURES]
    proj = staged.select(
        *[F.expr(e).cast("long").alias(n) for n, e in fexprs],
        (F.col("lang") == F.lit(label_lang)).cast("long").alias("y"),
    )
    names = [n for n, _ in fexprs]
    # widen BEFORE the product: f2 (milli mean token length) is unbounded,
    # so a pathological single-token document could overflow an int64
    # per-row product (Spark wraps silently, DuckDB raises — the twins
    # would diverge).  decimal·long promotes the whole product to decimal.
    cells = [
        (f"{a}.{b}", f"cast({a} as decimal(38,0)) * {b}")
        for i, a in enumerate(names)
        for b in names[i:]
    ]
    cells += [(f"{n}.y", f"cast({n} as decimal(38,0)) * y") for n in names]
    agg = proj.agg(
        *[
            F.sum(F.expr(prod).cast("decimal(38,0)")).alias(cell)
            for cell, prod in cells
        ]
    )
    stack = ", ".join(f"'{cell}', `{cell}`" for cell, _ in cells)
    return agg.select(
        F.expr(f"stack({len(cells)}, {stack}) as (cell, s_wide)")
    ).select("cell", F.col("s_wide").cast("long").alias("s"))


def probe_fit_stats_sql(label_lang: str = "en") -> str:
    """DuckDB twin of :func:`probe_fit_stats` over ``documents``."""
    feats = (
        "SELECT doc_id, lang,\n"
        "       greatest(CAST(length(string_split(text, ' ')) AS BIGINT), 1) AS nt,\n"
        "       greatest(CAST(length(text) AS BIGINT), 1) AS nc,\n"
        "       CAST(length(list_filter(string_split(text, ' '),"
        f" x -> x IN ({', '.join(repr(s) for s in text.STOPWORDS)}))) AS BIGINT) AS stop_cnt,\n"
        "       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digit_cnt,\n"
        "       CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS upper_cnt\n"
        "FROM documents"
    )
    fexprs = [(n, e.format(d="//", L400="400")) for n, e in PROBE_FEATURES]
    names = [n for n, _ in fexprs]
    proj = ",\n       ".join(
        [f"CAST({e} AS BIGINT) AS {n}" for n, e in fexprs]
        + [f"CAST(lang = '{label_lang}' AS BIGINT) AS y"]
    )
    # HUGEINT widening BEFORE the product (mirrors the Spark decimal cast):
    # f2 is unbounded, so the 64-bit product could overflow on one row
    cells = [
        (f"{a}.{b}", f"CAST({a} AS HUGEINT) * {b}")
        for i, a in enumerate(names)
        for b in names[i:]
    ]
    cells += [(f"{n}.y", f"CAST({n} AS HUGEINT) * y") for n in names]
    sums = ",\n       ".join(
        f'CAST(sum({prod}) AS BIGINT) AS "{cell}"' for cell, prod in cells
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT '{cell}' AS cell, \"{cell}\" AS s FROM sums" for cell, _ in cells
    )
    return f"""
WITH feats AS (
{feats}
),
proj AS (
  SELECT {proj}
  FROM feats
),
sums AS (
  SELECT {sums}
  FROM proj
)
{unions}
"""


def solve_probe(stats_rows) -> dict:
    """Driver-side solve of the normal equations from
    :func:`probe_fit_stats`'s collected rows: returns {feature: weight}
    (float64 least squares via numpy; the distributed sums are exact, the
    k×k solve is the only floating step)."""
    import numpy as np

    s = {r["cell"]: float(r["s"]) for r in stats_rows}
    names = [n for n, _ in PROBE_FEATURES]
    k = len(names)
    xtx = np.empty((k, k))
    xty = np.empty(k)
    for i, a in enumerate(names):
        xty[i] = s[f"{a}.y"]
        for j, b in enumerate(names):
            xtx[i, j] = s[f"{a}.{b}" if i <= j else f"{b}.{a}"]
    w, *_ = np.linalg.lstsq(xtx, xty, rcond=None)
    return dict(zip(names, w))
