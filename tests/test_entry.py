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
    # and the rotation leads the window: the full r11 changed-in-round
    # union takes priority (the deferral guard — the continuation sessions
    # touched the ANN/BM25/RRF families after the original rotation), then
    # the 9-entry r5-green stale set (driver rows 6 rounds old) fills to
    # 50; the r7-green block is deferred to lead r12.  x122/x123 are new
    # (ungated → sort first automatically)
    for name in (
        # new gates this round
        "x122_lsh_multipass_neardup", "x123_semantic_dedup_auto",
        # r5-green block (driver rows 6 rounds old at r11)
        "x49_quality_canonical", "x54_temperature_sample",
        "x70_bpe_pair_counts", "x72_span_dedup_rewrite",
        "x73_incremental_dedup", "x74_stream_dedup_index",
        "x75_training_shards", "x76_vocab_spectrum", "x78_lang_confusion",
    ):
        assert name in window
