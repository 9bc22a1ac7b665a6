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
    # and the promised rotation leads the window: r8 gates the 19-entry
    # r4-stale block first (VERDICT r7 item 1)
    for name in ("x28_train_split", "x29_stratified_sample",
                 "x30_length_quantiles", "x32_repetition", "x34_decontaminate",
                 "x50_pii_redaction", "x51_training_order",
                 "x55_select_top_quality", "x57_fuzzy_decontaminate",
                 "x58_tfidf_top_terms", "x59_inverted_index",
                 "x60_normalize_text", "x61_pair_integrity", "x62_oov_rate",
                 "x63_corpus_diff", "x65_leakage_free_splits",
                 "x66_stream_sessionization", "x67_duplicated_spans",
                 "x68_stream_event_rates"):
        assert name in window
