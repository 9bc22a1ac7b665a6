"""Skew mitigations (SCALE.md §4): salted joins must be result-identical to
plain joins; the shingle frequency cap must only ever lower intersection
counts and converge to exact as the cap rises."""

import pytest
from pyspark.sql import functions as F

from flockdb_spark.functions.dedup import ngram_jaccard_pairs
from flockdb_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_sides(spark):
    # key 7 is hot (200 rows); other keys are singletons
    left = spark.createDataFrame(
        [(7, i) for i in range(200)] + [(k, k) for k in range(20)], "k int, payload int"
    )
    right = spark.createDataFrame(
        [(7, "hot"), (3, "x"), (5, "y"), (99, "absent-left")], "k int, tag string"
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed_sides, how):
    left, right = skewed_sides
    plain = left.join(right, on=["k"], how=how)
    salted = salted_join(left, right, on=["k"], how=how, salt=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, skewed_sides):
    left, _ = skewed_sides
    salts = (
        left.withColumn("_s", F.pmod(F.xxhash64("k", "payload"), F.lit(8)))
        .where(F.col("k") == 7)
        .select("_s")
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key's rows really land on all sub-keys


def test_shingle_df_cap_is_conservative_and_converges(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common alpha beta gamma delta"),
            (2, "common common common alpha beta gamma epsilon"),
            (3, "common common common zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    exact = {
        (r["a"], r["b"]): r["n_inter"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    capped = {
        (r["a"], r["b"]): r["n_inter"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=2).collect()
    }
    # capped intersections never exceed exact, and unions stay exact-sized
    for k, v in capped.items():
        assert v <= exact[k]
    # a cap above every shingle's document frequency reproduces exact results
    wide = {
        (r["a"], r["b"]): r["n_inter"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=100).collect()
    }
    assert wide == exact


def test_simhash_hamming_pairs_match_bruteforce(spark):
    """Pigeonhole banding must find EXACTLY the pairs within the Hamming
    bound — verified against an all-pairs popcount on a small corpus."""
    from itertools import combinations

    from flockdb_spark.functions.dedup import simhash, simhash_neardup_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
            (4, "one two three four five six seven nine"),
            (5, "completely different words in this document here now"),
        ],
        "doc_id long, text string",
    )
    sig_rows = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    k = 16
    expected = {
        (a, b)
        for a, b in combinations(sorted(sig_rows), 2)
        if bin(sig_rows[a] ^ sig_rows[b]).count("1") <= k
    }
    got = {(r["a"], r["b"]) for r in simhash_neardup_pairs(simhash(docs), max_hamming=k).collect()}
    assert got == expected
    assert (1, 2) in got and (3, 4) in got  # the near-dup plants really pair


def test_resolve_duplicates_chain_components(spark):
    """Min-label propagation must converge across a 5-hop chain and keep
    disjoint clusters apart."""
    from flockdb_spark.functions.dedup import resolve_duplicates

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)], "a long, b long"
    )
    got = {r["doc_id"]: r["canonical_id"] for r in resolve_duplicates(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_resolve_duplicates_deep_chain_pointer_jumping(spark):
    """The sf3.0 regression: a component DEEPER than the iteration cap.
    Plain hop-propagation silently returned unconverged labels on a
    60-hop chain with max_iterations=20; pointer jumping converges in
    O(log diameter) — ~7 rounds here — and must label every node with the
    component min."""
    from flockdb_spark.functions.dedup import resolve_duplicates

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "a long, b long"
    )
    got = {r["doc_id"]: r["canonical_id"] for r in resolve_duplicates(pairs).collect()}
    assert got == {i: 0 for i in range(61)}
