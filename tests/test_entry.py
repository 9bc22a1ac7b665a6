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
    # and the r6-deferred seven lead the gated (non-ungated) portion
    for name in ("x33_seq_packing", "x87_jsonl_roundtrip", "x88_csv_roundtrip",
                 "x52_lsh_ann_multitable", "x96_salted_join",
                 "x64_label_centroids", "x94_kn_perplexity"):
        assert name in window
