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
    # and the promised rotation leads the window: r10 gates the now-stalest
    # block first — the 27-entry r7-green set whose driver rows are 3
    # rounds old (VERDICT r9 item 1), filled with the oldest r8 rows
    for name in (
        # r7-green block (driver rows 3 rounds old at r10)
        "q01_point_lookup", "q02_contains", "q03_metadata",
        "q04_degree_counts", "q14_select_edges", "q23_select2_batch",
        "q25_ordered_uuid", "x98_semantic_dedup", "x100_quality_classifier",
        "x102_phrase_match", "x103_heavy_hitters_sketch",
        "x104_orc_roundtrip", "x105_vocab_drift", "x106_probe_fit",
        "x107_multi_phrase", "x108_neighborhood_jaccard", "x33_seq_packing",
        "x87_jsonl_roundtrip", "x88_csv_roundtrip", "x52_lsh_ann_multitable",
        "x96_salted_join", "x64_label_centroids", "x94_kn_perplexity",
        "x84_heavy_hitters", "x18_lsh_neardup", "x06_lsh_ann", "x15_ivf_ann",
        # oldest r8-green fill
        "x28_train_split", "x29_stratified_sample", "x30_length_quantiles",
        "x32_repetition", "x34_decontaminate", "x50_pii_redaction",
        "x51_training_order", "x55_select_top_quality",
        "x57_fuzzy_decontaminate", "x58_tfidf_top_terms", "x59_inverted_index",
        "x60_normalize_text", "x61_pair_integrity", "x62_oov_rate",
        "x63_corpus_diff",
        # x65_leakage_free_splits was the 50th slot until the new-in-r10
        # x121 (ungated → sorts first) displaced it; x65's last driver row
        # (r8) stays the freshest of the displaced fill block
        "x121_dsir_selection",
    ):
        assert name in window
