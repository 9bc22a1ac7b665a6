"""Hot-key (skew) mitigations — SCALE.md §4.

Vertex degree and shingle frequency are power-law; at 100 TB one hot join key
can pin a whole stage on a single reducer.  Two mitigations beyond AQE's
runtime skew-split (which only rewrites sort-merge joins):

- ``salted_join``: explicit key salting for shuffled equi-joins whose
  non-skewed side is too big to broadcast — the skewed side's rows scatter
  over ``salt`` sub-keys, the other side replicates ×salt, so the hot key's
  work spreads over ``salt`` reducers.
- frequency capping for self-join explosion (see
  ``dedup.ngram_jaccard_pairs(max_shingle_df=...)``): an over-frequent join
  key creates O(df²) output pairs — no partitioning trick fixes quadratic
  OUTPUT, so the key itself is dropped (frequent shingles carry no near-dup
  signal, the same reason MinHash ignores them statistically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values in the ``on`` columns.

    The skewed side gets a deterministic per-row salt (hash of the whole row,
    so a hot key's rows spread uniformly); ``other`` is replicated once per
    salt value.  Supported ``how``: inner / left / left_semi / left_anti —
    every variant where replicating the right side preserves semantics
    (each (key, salt) slice of the right is a full copy keyed on ``on``).
    Cost: |other| × salt extra shuffle volume — use when |other| ≫ broadcast
    threshold but ≪ |skewed|.
    """
    salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)).cast("int")
    left = skewed.withColumn("_salt", salt_expr)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)]))
    )
    out = left.join(right, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
