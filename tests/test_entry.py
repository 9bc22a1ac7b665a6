"""Driver-contract invariants of __spark_entry__ (ADVICE r6): registry and
oracle keys agree, and — the deferral guard — every query changed in the
current round sits inside the driver's 50-entry gate window, so a change
can never ship with only local coverage again."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402


def test_registry_and_oracles_align():
    qs = list(entry.queries())
    os_ = list(entry.oracle_sql())
    # every oracle belongs to a registered query (queries without an oracle
    # get the driver's weaker rows-only check, which is allowed)
    assert set(os_) <= set(qs)
    # the gate ordering puts ungated entries first and is a permutation
    assert sorted(qs) == sorted(set(qs)) and len(qs) >= 136


def test_changed_queries_sit_inside_gate_window():
    qs = list(entry.queries())
    window = set(qs[: entry.GATE_WINDOW])
    missing = [n for n in entry._CHANGED_IN_ROUND if n not in window]
    assert not missing, (
        f"changed-in-round queries outside the driver's {entry.GATE_WINDOW}-"
        f"entry gate window: {missing} — reorder _GATED_GREEN"
    )
    # and the promised rotation leads the window: r9 gates the now-stalest
    # blocks first — the 9-entry r5 remainder plus the 31-entry r6-green
    # block (VERDICT r8 item 2)
    for name in (
        # r5 remainder (driver rows 4 rounds old at r9)
        "x80_count_min_sketch", "x81_stream_sketch",
        "x82_bloom_decontaminate", "x83_hll_registers",
        "x85_fixed_size_sample", "x86_stream_interval_join",
        "x89_zorder_key", "x90_token_budget", "x92_last_touch",
        # r6-green block (3 rounds old)
        "q06_keyset_pages", "q07_by_destination", "q08_backward",
        "q09_where_in", "q10_intersection", "q11_union", "q12_difference",
        "q13_nested", "q15_incl_archived", "q16_state_filters",
        "q17_oplog_replay", "q18_mass_action", "q19_metadata_merge",
        "q20_reconcile", "q21_count_estimates", "x01_dedup_exact",
        "x02_ngram_jaccard", "x17_dedup_resolve", "x03_minhash_lsh",
        "x04_simhash", "x16_simhash_neardup", "x05_ann_topk",
        "x35_multiprobe_ann", "x53_lsh_neardup_multitable", "x56_int8_ann",
        "x69_kmeans_fit", "x77_embedding_outliers", "x47_bigram_surprisal",
        "x91_kneser_ney", "x93_personalized_pagerank", "x95_collocations",
    ):
        assert name in window
